"""Deterministic text/hash primitives, defined ONCE for both engines.

Every primitive here exists in two aligned forms: a Spark Column builder and
a DuckDB SQL-fragment builder sharing the same constants.  Alignment is
load-bearing — the driver's oracle gate hash-compares Spark output against
DuckDB, so tokenization, shingling, and every hash must be bit-identical.

Verified equivalences (tests/test_functions.py):
- ``split(lower(t), '\\s+')`` == ``string_split_regex(lower(t), '\\s+')``
  including empty-string edge behavior;
- md5-prefix 56-bit hash: ``conv(substr(md5(s),1,14),16,10)`` ==
  ``CAST('0x' || substr(md5(s),1,14) AS BIGINT)``;
- MinHash permutations use 29-bit multipliers against a 33-bit prime so
  ``a*h + b`` stays under 2^62 — no overflow under Spark's ANSI mode and no
  engine-specific wraparound.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- constants (single source of truth for both engines) ---------------------

#: Prime modulus for MinHash permutations (> 2^32).
MINHASH_PRIME = 4_294_967_311
#: Number of MinHash permutations; BANDS * ROWS_PER_BAND must equal it.
NUM_PERM = 16
LSH_BANDS = 4
LSH_ROWS = 4
#: Deterministic permutation parameters (Knuth multiplicative hashing step,
#: odd multipliers below 2^29; offsets below the prime).
MINHASH_A = [((2_654_435_761 * (j + 1)) % ((1 << 29) - 1)) | 1 for j in range(NUM_PERM)]
MINHASH_B = [(40_503 * (j + 1) * (j + 1) + 7 * (j + 1)) % MINHASH_PRIME for j in range(NUM_PERM)]

#: SimHash width (bits) and LSH band layout for hamming blocking.
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8 bits each; hamming distance <= SIMHASH_BANDS-1 always shares a band

#: Shingle width (words) for MinHash / fingerprinting.
SHINGLE_W = 3

EMPTY = ""

# --- cached Spark-SQL expression builder (r14 optimization round) ------------
#
# Higher-order functions built through the Column DSL (transform/filter/
# aggregate with Python lambdas) cost ~10-20 ms of py4j round trips EACH
# at construction time, and the bench's timed region rebuilds every
# query's plan per run — a 16-permutation MinHash signature alone was
# ~0.3 s of driver-side lambda plumbing per construction.  The hot
# builders below therefore have Spark-SQL STRING twins (suffix ``_sx``,
# mirroring the DuckDB ``_sql`` twins structurally), compiled to a Column
# once per distinct string via the lru-cached ``xp`` and reused — Column
# objects are immutable expression trees, safe to share across plans and
# sessions on one gateway.  The semantics are identical to the DSL forms
# (same Catalyst expressions after parsing); only the construction path
# changed.  Numeric-literal dialect note: SQL ``0.0`` parses as DECIMAL,
# so double literals must be written ``0D`` in _sx strings.


@lru_cache(maxsize=2048)
def xp(sql: str) -> Column:
    """Cached ``F.expr``: each distinct expression string is parsed once
    per process instead of rebuilt through py4j per query construction."""
    return F.expr(sql)


# --- tokenization ------------------------------------------------------------


def tokens(col: str = "text") -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return xp(tokens_sx(col))


def tokens_of(col: Column | str) -> Column:
    """``tokens`` over an arbitrary Column expression (or a Spark-SQL
    expression string — the cached fast path, see ``xp``)."""
    if isinstance(col, str):
        return xp(tokens_sx(col))
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != EMPTY)


def tokens_sx(expr: str = "text") -> str:
    """Spark-SQL twin of :func:`tokens_of` (dialect note: ``'\\\\s+'`` in
    the emitted SQL is the regex ``\\s+`` after SQL-literal unescaping)."""
    return f"filter(split(lower({expr}), '\\\\s+'), t -> t != '')"


def tokens_sql(col: str = "text") -> str:
    return f"list_filter(string_split_regex(lower({col}), '\\s+'), t -> t <> '')"


# --- hashing -----------------------------------------------------------------


def h56(col: Column) -> Column:
    """56-bit integer hash of a string: first 14 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def h56_sx(expr: str) -> str:
    """Spark-SQL twin of :func:`h56`."""
    return f"cast(conv(substring(md5({expr}), 1, 14), 16, 10) as bigint)"


def h56_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 14) AS BIGINT)"


# --- shingles ----------------------------------------------------------------


def shingles(tok: Column | str, w: int = SHINGLE_W) -> Column:
    """Word w-grams as space-joined strings; empty array when < w tokens.

    Built with sequence+transform (no explode): stays a per-row array op, so
    shingling fuses into the scan stage — no shuffle at any scale.
    Accepts a Spark-SQL expression string for the cached fast path (``xp``).
    """
    if isinstance(tok, str):
        return xp(shingles_sx(tok, w))
    n = F.size(tok)
    return F.when(n < w, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (w - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, w)),
        )
    )


def shingles_sx(tok_expr: str, w: int = SHINGLE_W) -> str:
    """Spark-SQL twin of :func:`shingles`."""
    return (
        f"case when size({tok_expr}) < {w} then cast(array() as array<string>) "
        f"else transform(sequence(1, size({tok_expr}) - {w - 1}), "
        f"i -> concat_ws(' ', slice({tok_expr}, i, {w}))) end"
    )


def shingles_sql(tok_expr: str, w: int = SHINGLE_W) -> str:
    return (
        f"CASE WHEN len({tok_expr}) < {w} THEN []::VARCHAR[] "
        f"ELSE [array_to_string(({tok_expr})[i:i+{w - 1}], ' ') "
        f"FOR i IN generate_series(1, len({tok_expr}) - {w - 1})] END"
    )


# --- MinHash -----------------------------------------------------------------


def minhash_sig(shingle_col: Column | str) -> list[Column]:
    """NUM_PERM MinHash values, each an independent permutation min.

    Per-row array math only (array_min over transform) — no explode, no
    shuffle; the signature computation is embarrassingly parallel and fuses
    into the scan at any scale.  Accepts a Spark-SQL expression string for
    the cached fast path (17 higher-order lambdas per DSL build, ~0.3 s of
    py4j per query construction — see ``xp``).
    """
    if isinstance(shingle_col, str):
        return [
            xp(s).alias(f"mh{j}")
            for j, s in enumerate(minhash_sig_sx(shingle_col))
        ]
    hashed = F.transform(shingle_col, lambda s: h56(s) % MINHASH_PRIME)
    return [
        F.array_min(
            F.transform(hashed, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME)
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def minhash_sig_sx(shingle_expr: str) -> list[str]:
    """Spark-SQL twin of :func:`minhash_sig` (unaliased expressions)."""
    hashed = f"transform({shingle_expr}, s -> ({h56_sx('s')}) % {MINHASH_PRIME})"
    return [
        f"array_min(transform({hashed}, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def minhash_sig_sql(shingle_expr: str) -> list[str]:
    hashed = f"list_transform({shingle_expr}, s -> ({h56_sql('s')}) % {MINHASH_PRIME})"
    return [
        f"list_min(list_transform({hashed}, h -> ({a} * h + {b}) % {MINHASH_PRIME})) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def band_key(j: int) -> Column:
    """LSH band key: concat of the band's ROWS consecutive minhash values."""
    cols = [F.col(f"mh{j * LSH_ROWS + r}") for r in range(LSH_ROWS)]
    return F.concat_ws("_", *[c.cast("string") for c in cols])


def band_key_sql(j: int) -> str:
    cols = [f"CAST(mh{j * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)]
    return f"concat_ws('_', {', '.join(cols)})"


# --- SimHash -----------------------------------------------------------------


def token_hashes(tok: Column | str) -> Column:
    """Per-token SIMHASH_BITS-bit hashes (hash once, reuse across all bits).
    Accepts a Spark-SQL expression string for the cached fast path."""
    if isinstance(tok, str):
        return xp(
            f"transform({tok}, t -> ({h56_sx('t')}) % {1 << SIMHASH_BITS})"
        )
    return F.transform(tok, lambda t: h56(t) % F.lit(1 << SIMHASH_BITS))


def token_hashes_sql(tok_expr: str) -> str:
    return f"list_transform({tok_expr}, t -> ({h56_sql('t')}) % {1 << SIMHASH_BITS})"


def _bit_ones(th: Column, k: int) -> Column:
    # PySpark's higher-order-function lambdas must be exactly 2-ary for the
    # merge step, so bind k via an enclosing function, not a default arg.
    return F.aggregate(
        th, F.lit(0).cast("long"), lambda acc, h: acc + F.shiftright(h, k) % 2
    )


def simhash_from_hashes(th: Column | str) -> Column:
    """SIMHASH_BITS-bit SimHash from pre-hashed tokens (majority per bit).

    Callers must materialize ``token_hashes`` as a real column first so md5
    runs once per token, not once per bit.  Accepts a Spark-SQL expression
    string for the cached fast path (32 aggregate lambdas per DSL build).
    """
    if isinstance(th, str):
        return xp(simhash_from_hashes_sx(th))
    n = F.size(th)
    out = F.lit(0).cast("long")
    for k in range(SIMHASH_BITS):
        ones = _bit_ones(th, k)
        out = out + F.when(ones * 2 > n, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_from_hashes_sx(th_expr: str) -> str:
    """Spark-SQL twin of :func:`simhash_from_hashes` — one parseable
    string for all SIMHASH_BITS majority terms."""
    terms = ["cast(0 as bigint)"]
    for k in range(SIMHASH_BITS):
        ones = (
            f"aggregate({th_expr}, cast(0 as bigint), "
            f"(acc, h) -> acc + shiftright(h, {k}) % 2)"
        )
        terms.append(
            f"(case when ({ones}) * 2 > size({th_expr}) "
            f"then cast({1 << k} as bigint) else cast(0 as bigint) end)"
        )
    return "(" + " + ".join(terms) + ")"


def simhash_from_hashes_sql(th_expr: str) -> str:
    terms = []
    for k in range(SIMHASH_BITS):
        ones = f"list_sum(list_transform({th_expr}, h -> (h >> {k}) & 1))"
        terms.append(
            f"(CASE WHEN 2 * coalesce({ones}, 0) > len({th_expr}) "
            f"THEN {1 << k}::BIGINT ELSE 0::BIGINT END)"
        )
    return "(" + " + ".join(terms) + ")"


def simhash_band(col: Column, j: int) -> Column:
    """8-bit band j of a SIMHASH_BITS simhash (for hamming LSH blocking)."""
    width = SIMHASH_BITS // SIMHASH_BANDS
    return F.shiftright(col, j * width) % F.lit(1 << width)


def simhash_band_sql(expr: str, j: int) -> str:
    width = SIMHASH_BITS // SIMHASH_BANDS
    return f"(({expr} >> {j * width}) & {(1 << width) - 1})"


# --- multi-class PII scrub ----------------------------------------------------

#: Redaction classes for the governance scrub, in PRIORITY ORDER — each
#: class is counted on, then replaced in, the text the EARLIER classes
#: already scrubbed, so an email's digits are never double-counted as a
#: digit run and "1.2.3.4" is an <ip>, never a <phone>.  Patterns use
#: only constructs with identical semantics in Java regex (Spark) and
#: RE2 (DuckDB): character classes, bounded repeats, non-capturing
#: groups, alternation, and the ASCII word boundary \b — no lookaround,
#: no backreferences (RE2 has neither).  Replacement tokens contain no
#: digits, so the final digit-run class cannot re-match a placeholder.
#:
#: Class notes (boundary rows pinned in tests/test_functions.py):
#: - email: local@domain.tld with a >=2-letter TLD; single-letter TLDs
#:   ("a@b.c") deliberately fall through to the digit-run class.
#: - ipv4: four 1-3 digit octets, \b-guarded so "1234.5.6.7890" is not
#:   partially scrubbed.  Purely shape-based (no 0-255 range check —
#:   regex range alternations diverge across engines for no governance
#:   gain); version/section strings like "1.2.3.4" are inside the
#:   envelope by design (conservative scrub).
#: - phone: optional +country, then >=3 separator-joined digit groups
#:   ("555-867-5309", "+49 30 1234 5678", "(555) 867-5309"); two-group
#:   runs ("867-5309") are too ambiguous (ranges, scores) and fall to
#:   the digit-run class.  Dashed US dates ("01-15-2024") are
#:   phone-shaped and scrub; ISO dates ("2024-01-15") survive via the
#:   1-3 digit first group + \b.
#: - num: any remaining digit run (the original single-class scrub).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b"
PII_PHONE_RE = (
    r"\+?\((?:[0-9]{2,4})\)(?:[-. ][0-9]{2,4}){2,4}"
    r"|\+?\b[0-9]{1,3}(?:[-. ][0-9]{2,4}){2,4}"
)
PII_NUM_RE = "[0-9]+"
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", PII_EMAIL_RE, "<email>"),
    ("ipv4", PII_IPV4_RE, "<ip>"),
    ("phone", PII_PHONE_RE, "<phone>"),
    ("num", PII_NUM_RE, "<num>"),
]


def pii_stages(col: Column) -> tuple[list[tuple[str, Column]], Column]:
    """(per-class count columns, fully-scrubbed text) over ``col``.

    Counts are staged: class k counts matches in the text with classes
    0..k-1 already replaced.  All expression-level (regexp_count /
    regexp_replace chains) — scan-fused, no shuffle, no UDF.
    """
    counts: list[tuple[str, Column]] = []
    cur = col
    for name, pat, repl in PII_CLASSES:
        counts.append(
            (name, F.regexp_count(cur, F.lit(pat)).cast("long"))
        )
        cur = F.regexp_replace(cur, pat, repl)
    return counts, cur


def pii_scrubbed(col: Column) -> Column:
    """Just the fully-scrubbed text (all PII_CLASSES replaced, in order)."""
    return pii_stages(col)[1]


def _pii_stage_sql(expr: str, upto: int) -> str:
    """``expr`` with classes 0..upto-1 replaced (DuckDB; 'g' = all)."""
    for name, pat, repl in PII_CLASSES[:upto]:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def pii_count_sql(expr: str, k: int) -> str:
    """DuckDB count of class k over the stage-k text (see pii_stages)."""
    staged = _pii_stage_sql(expr, k)
    return (
        f"CAST(len(regexp_extract_all({staged}, "
        f"'{PII_CLASSES[k][1]}')) AS BIGINT)"
    )


def pii_scrubbed_sql(expr: str) -> str:
    """DuckDB twin of :func:`pii_scrubbed`."""
    return _pii_stage_sql(expr, len(PII_CLASSES))
