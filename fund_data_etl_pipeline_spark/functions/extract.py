"""Extraction expression library (SURVEY.md §2.3 P1-P16, §2.4 F1-F4).

The reference hand-wrote ~80 near-identical per-platform parser functions
(~4,500 LoC); the engine replaces them with ~a dozen generic expression
builders, each compiling to built-in Catalyst expressions (regexp_extract,
filter/transform/aggregate over the ``lines`` array) — JVM-side, inside
whole-stage codegen, no Python in the hot path.

Conventions:
- ``text`` is the full document (lines joined by '\\n'); ``lines`` is
  ``split(text, '\\n')``.
- every builder returns a STRING column ('' and no-match both -> NULL);
  numeric casting/rounding happens later in normalize (N2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUM = r"-?[\d,，]+(?:\.\d+)?"  # tolerant money/shares literal
CODE6 = r"[0-9A-Za-z]{6}"      # fund codes: 6 chars, leading zeros kept


def _s(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _nn(col: Column) -> Column:
    """'' -> NULL (regexp_extract returns '' on no match)."""
    return F.nullif(col, F.lit(""))


def spaced(label: str) -> str:
    """P5 — whitespace-tolerant label pattern for PDF letter-spacing:
    '基金代码' -> '基\\s*金\\s*代\\s*码' (dividend_extractor.py:551-556)."""
    return r"\s*".join(label)


def label_value(text: Column | str, label: str, value: str = NUM,
                sep: str = r"[ \t]*[：:]?[ \t]*",
                tolerate_spacing: bool = False) -> Column:
    """P1/P2 — first `label<sep>value` occurrence anywhere in the document
    (`re.search` dividend_extractor.py:48-49; first-matching-line scan
    :119-133 is equivalent because regexp_extract takes the first match).

    The separator is SAME-LINE ([ \\t], never \\s — the reference's own
    ``[：: ]*`` class): with \\s* a label whose value cell is empty would
    silently capture the first number on a FOLLOWING line (r11 review:
    '红利金额：\\n20240101 对账单' extracted the date as the amount — a
    corrupt money value that passes the field gates). Cross-line values
    are an explicit shape with their own builder (next_line_value, P3)
    or an explicit ``sep`` at the call site."""
    lbl = spaced(label) if tolerate_spacing else label
    return _nn(F.regexp_extract(_s(text), f"{lbl}{sep}({value})", 1))


def rx(text: Column | str, pattern: str, group: int = 1) -> Column:
    """Generic first-match regexp extraction ('' -> NULL) for platform
    specs whose reference regex doesn't decompose into label+value (e.g.
    长量's trailing-unit form `确认金额[：: ]*(NUM).*?\\(元\\)`,
    purchase_confirm_extractor.py:158-170)."""
    return _nn(F.regexp_extract(_s(text), pattern, group))


def label_value_until(text: Column | str, label: str,
                      stops: tuple[str, ...] = (),
                      sep: str = r"[ \t]*[：:]?[ \t]*") -> Column:
    """Same-line free-text value after ``label``, cut at the first stop
    keyword — the reference's ``line.split(label)[1]`` +
    ``split(stop)[0]`` idiom (宁波 客户名称…基金账号
    purchase_confirm_extractor.py:1184-1207; 民生 客户名称…交易类型
    purchase_extractor.py:546-553). The separator/trim classes are
    same-line ([ \\t], never \\s): a label with no same-line value must
    yield '' like the reference's split, not leak the next line."""
    # the alternation needs its own group: bare '|'.join would attach
    # [^\n]* to the LAST stop only, so earlier stop keywords could not
    # cut mid-line and the capture swallowed the tail (r11 review;
    # latent — every current caller passes exactly one stop)
    tail = f"(?:(?:{'|'.join(stops)})[^\\n]*)?" if stops else ""
    return _nn(
        F.regexp_extract(
            _s(text), rf"(?m){label}{sep}([^\n]*?)[ \t]*{tail}$", 1
        )
    )


def line_after(text: Column | str, anchor: str, min_len: int = 1) -> Column:
    """The full line following the first line containing ``anchor`` (交行
    投资者信息 -> name on next line, purchase_extractor.py:297-310)."""
    return _nn(
        F.regexp_extract(
            _s(text), rf"(?m){anchor}[^\n]*\n([^\n]{{{min_len},}})$", 1
        )
    )


def adjacent_name(lines: Column | str, anchor: str,
                  prev_stops: tuple[str, ...] = (),
                  next_stops: tuple[str, ...] = (),
                  inline_before: bool = False) -> Column:
    """P4 variant — name assembled from the lines AROUND the anchor label:
    previous line (unless it carries a stop keyword) + optionally the text
    before the anchor on its own line + next line (unless stopped).
    Models 好买 账户名称 (purchase_extractor.py:34-46), 天天
    账户户名 (:59-81), 盈米 投资者名称 (:175-190). Pure Catalyst."""
    ls = _s(lines)
    idx = F.array_position(
        F.transform(ls, lambda l: l.contains(anchor)), F.lit(True)
    )
    prev = F.when(idx > 1, F.trim(F.element_at(ls, (idx - 1).cast("int")))).otherwise(
        F.lit("")
    )
    prev_ok = prev != ""
    for s in prev_stops:
        prev_ok = prev_ok & ~prev.contains(s)
    prev_part = F.when(prev_ok, prev).otherwise(F.lit(""))
    inline_part = (
        F.when(
            idx > 0,
            F.trim(
                F.substring_index(F.element_at(ls, idx.cast("int")), anchor, 1)
            ),
        ).otherwise(F.lit(""))
        if inline_before
        else F.lit("")
    )
    nxt = F.trim(F.coalesce(F.try_element_at(ls, (idx + 1).cast("int")), F.lit("")))
    nxt_ok = nxt != ""
    for s in next_stops:
        nxt_ok = nxt_ok & ~nxt.contains(s)
    next_part = F.when(nxt_ok, nxt).otherwise(F.lit(""))
    return F.when(
        idx > 0,
        F.nullif(F.concat(prev_part, inline_part, next_part), F.lit("")),
    )


def next_line_value(text: Column | str, label: str, value: str = NUM,
                    lookahead: int = 2) -> Column:
    """P3 — label on line i, value alone on one of lines i+1..i+lookahead
    (天天 dividend amount, dividend_extractor.py:85-105; 网金
    purchase_extractor.py:398-406). Implemented as a multi-line regex on
    the full text — no explode/shuffle needed."""
    skip = rf"(?:[^\n]*\n){{0,{lookahead - 1}}}?"
    return _nn(
        F.regexp_extract(
            _s(text), rf"(?m){label}[^\n]*\n{skip}[ \t　]*({value})[ \t　]*$", 1
        )
    )


def box_cell(text: Column | str, label: str, value: str = NUM) -> Column:
    """P6 — box-drawing table cell: value in the `│`-delimited cell right
    of the labelled cell (腾元 purchase_confirm_extractor.py:610-656)."""
    return _nn(
        F.regexp_extract(_s(text), rf"{label}\s*│\s*({value})\s*(?:│|┃|$)", 1)
    )


def positional_value(lines: Column | str, anchor: str, offset: int) -> Column:
    """P7 — whitespace-split positional token: on the first line containing
    ``anchor``, split on whitespace, return the token ``offset`` positions
    after the anchor token (国信嘉利 dividend_extractor.py:1131-1160)."""
    line = F.try_element_at(
        F.filter(_s(lines), lambda l: l.contains(anchor)), F.lit(1)
    )
    toks = F.split(F.trim(line), r"\s+")
    anchor_tok = F.try_element_at(
        F.filter(toks, lambda t: t.contains(anchor)), F.lit(1)
    )
    pos = F.array_position(toks, anchor_tok)
    return F.when(
        pos > 0, F.try_element_at(toks, (pos + F.lit(offset)).cast("int"))
    )


def row_table_records(text: Column | str, row_pattern: str) -> Column:
    """P8/F4 — tabular summary rows -> array of raw row strings, one record
    per match (证达通 dividend_extractor.py:946-983). Explode downstream."""
    return F.regexp_extract_all(_s(text), F.lit(row_pattern), 0)


def filename_value(filename: Column | str, pattern: str, group: int = 1) -> Column:
    """P9 — field derived from the file name (国信嘉利 product name
    dividend_extractor.py:1112-1129)."""
    return _nn(F.regexp_extract(_s(filename), pattern, group))


def candidate_max(text: Column | str, pattern: str = NUM) -> Column:
    """P12 — collect every candidate number matched by ``pattern``, strip
    separators, take the max (OCR noise; manual_purchase_apply_extractor.py:
    216-229). ``pattern`` may carry its own capture group (e.g. a label
    prefix: ``申请金额[：: ]*([\\d,]+\\.\\d{2})``); otherwise the whole
    match is the candidate. Returns DOUBLE."""
    import re as _re

    has_group = _re.search(r"(?<!\\)\((?!\?)", pattern) is not None
    regexp = pattern if has_group else f"({pattern})"
    cands = F.regexp_extract_all(_s(text), F.lit(regexp), 1)
    nums = F.transform(
        cands, lambda s: F.regexp_replace(s, "[,，]", "").try_cast("double")
    )
    return F.array_max(F.filter(nums, lambda x: x.isNotNull()))


def section_after(text: Column | str, marker: str) -> Column:
    """P16 — restrict extraction to the document section after the first
    line matching ``marker`` (JD forced-redemption page-2 block,
    redemption_extractor.py:379-459). Returns the tail text ('' -> NULL)."""
    t = _s(text)
    idx = F.instr(t, marker)
    return F.when(idx > 0, t.substr(idx, F.length(t)))


def stitched_name(lines: Column | str, start_label: str,
                  stop_keywords: list[str], max_lookahead: int = 4) -> Column:
    """P4 — multi-line product-name stitching: take the text after
    ``start_label`` on its line, then append following lines until one
    contains a stop keyword, up to ``max_lookahead`` lines (好买
    dividend_extractor.py:35-46; 平安 :355-381; 和讯 :463-489).

    Pure Catalyst: array_position to find the label line, slice for the
    lookahead window, aggregate to fold with stop semantics. No UDF.
    """
    ls = _s(lines)
    flags = F.transform(ls, lambda l: l.contains(start_label))
    idx = F.array_position(flags, F.lit(True))  # 1-based, 0 = not found
    head = F.regexp_extract(
        F.coalesce(F.try_element_at(ls, idx.cast("int")), F.lit("")),
        f"{start_label}[：:]?\\s*(.*)$",
        1,
    )
    window = F.when(
        idx > 0, F.slice(ls, (idx + 1).cast("int"), max_lookahead)
    ).otherwise(F.array().cast("array<string>"))
    # \Q..\E quotes each keyword (an ASCII regex metachar in a keyword
    # must match literally), and an EMPTY list means "no stop keywords"
    # — the bare join would build stop_re = "", and regexp_count(line,
    # "") > 0 stops the fold before the first appended line (r11 review;
    # latent — every current caller passes literal Chinese keywords)
    stop_re = (
        "|".join(f"\\Q{k}\\E" for k in stop_keywords if k)
        if any(stop_keywords)
        else "(?!)"  # never matches: only empty-line/lookahead stop
    )
    # an empty line ends the stitch too — the reference's loops break on
    # len(next_line) == 0 (redemption_extractor.py:608-618)
    folded = F.aggregate(
        window,
        F.struct(head.alias("acc"), F.lit(False).alias("stopped")),
        lambda acc, line: F.when(
            acc.stopped
            | (F.regexp_count(line, F.lit(stop_re)) > 0)
            | (F.length(F.trim(line)) == 0),
            F.struct(acc.acc.alias("acc"), F.lit(True).alias("stopped")),
        ).otherwise(
            F.struct(F.concat(acc.acc, F.trim(line)).alias("acc"),
                     F.lit(False).alias("stopped"))
        ),
    )
    return F.when(idx > 0, F.nullif(F.trim(folded.acc), F.lit("")))


def marker_records(text: Column | str, marker_pattern: str) -> Column:
    """F1/F2/F3 — segment a document into per-record windows at every
    occurrence of ``marker_pattern`` and return the window texts as an
    array (盈米 `序号:` blocks dividend_extractor.py:230-257; 联泰
    `交易信息（X/Y）` :834-876; 腾元 multi-page redemption_extractor.py:
    769-835). Split keeps text BETWEEN markers; the leading pre-marker
    chunk is dropped, so element k covers record k."""
    t = _s(text)
    parts = F.split(t, marker_pattern)
    n = F.size(parts)
    has = F.regexp_count(t, F.lit(marker_pattern)) > 0
    return F.when(has, F.slice(parts, 2, n - 1)).otherwise(
        F.array().cast("array<string>")
    )
