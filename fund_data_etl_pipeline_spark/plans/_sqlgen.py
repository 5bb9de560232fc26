"""DuckDB SQL fragments mirroring functions/text.py exactly (same hash
constants, same formulas) so hashed text operators get value-exact oracles."""

from __future__ import annotations

from ..functions.text import (
    BPE_TOKEN_RE,
    HASH_P,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_ROWS_PER_BAND,
    STOPWORDS,
    WS_RE,
)


def H(s: str) -> str:
    """DuckDB version of word_hash()."""
    return f"((('0x' || substr(md5({s}), 1, 8))::BIGINT) % {HASH_P})"


# whitespace class pinned to match functions.text.WS_RE exactly (Java \s
# vs RE2 \s differ on \x0B)
WORDS = (
    f"list_filter(string_split_regex(lower(trim(text)), '{WS_RE}'),"
    " w -> w <> '')"
)

SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),"
    " i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
)


def shingle_hashes_sql() -> str:
    """DuckDB version of functions.text.shingle_hashes (word-hash combine)."""
    from ..functions.text import SHINGLE_C1, SHINGLE_C2

    return (
        "list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),"
        f" i -> ({H('w[i]')} * {SHINGLE_C1} + {H('w[i+1]')} * {SHINGLE_C2}"
        f" + {H('w[i+2]')}) % {HASH_P}))"
    )


def minhash_sql(i: int, hs: str = "hs", seed: int = 0) -> str:
    """Minhash permutation i over pre-combined shingle hashes. ``seed=1``
    replays the independent second permutation set (MINHASH_A2/B2 — the
    r9 straggler-recovery pass)."""
    from ..functions.text import MINHASH_A2, MINHASH_B2

    a, b = (MINHASH_A[i], MINHASH_B[i]) if seed == 0 else (
        MINHASH_A2[i], MINHASH_B2[i]
    )
    return f"list_min(list_transform({hs}, h -> ({a} * h + {b}) % {HASH_P}))"


def band_key_sql(band: int, prefix: str = "mh") -> str:
    lo = band * MINHASH_ROWS_PER_BAND
    parts = " || '-' || ".join(
        f"{prefix}{i}::VARCHAR" for i in range(lo, lo + MINHASH_ROWS_PER_BAND)
    )
    return f"({parts})"


def simhash_sql(bits: int, hashes: str = "hs") -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter({hashes}, h -> (h & {1 << b}) <> 0))"
        f" > len({hashes}) THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"({terms})"


# ::BIGINT pins the type: DuckDB list_sum yields HUGEINT, which pandas
# renders as float64 and diverges from Spark's BIGINT under value hashing
# (round-1 text_fingerprint hash_match=false root cause).
POLY_FP = (
    f"COALESCE(list_sum(list_transform(generate_series(1, len(w)),"
    f" i -> (i * {H('w[i]')}) % {HASH_P})) % {HASH_P}, 0)::BIGINT"
)


def stopword_ratio_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"(CASE WHEN len(w) > 0 THEN"
        f" len(list_filter(w, x -> x IN ({lst}))) * 1.0 / len(w)"
        f" ELSE 0.0 END)"
    )


# C-style half-away-from-zero rounding matching functions.numeric.round2
def round_sql(expr: str, scale: int) -> str:
    p = float(10**scale)
    return (
        f"(SIGN({expr}) * FLOOR(ABS({expr}) * {p} + 0.5) / {p})"
    )


BPE_RE_SQL = BPE_TOKEN_RE.replace("\\", "\\\\") if False else BPE_TOKEN_RE
NORM_MD5 = f"md5(regexp_replace(lower(trim(text)), '{WS_RE}', ' ', 'g'))"


def cents_sql(expr: str) -> str:
    """DuckDB twin of functions.numeric.cents (exact BIGINT cents,
    half-away-from-zero like round_sql — r11)."""
    return f"CAST(SIGN({expr}) * FLOOR(ABS({expr}) * 100 + 0.5) AS BIGINT)"
