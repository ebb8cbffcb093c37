"""Text-analysis kernels for large-scale training-data pipelines: token
counting, quality scoring, language identification, document fingerprinting.

These are first-class engine operators beyond the reference's surface (the
reference has no text analytics; its scalar-function layer, SURVEY.md §2.9,
is the precedent for "vectorized kernels behind a registry"). Every kernel is
Arrow-vectorized (``pyarrow.compute`` — RE2 regexes, so patterns behave
identically to DuckDB's RE2), and each function documents its exact DuckDB
SQL mirror so the driver's oracle comparison is bit-faithful.

Float outputs use ``floor(x * 10^k) / 10^k`` instead of ``round`` — both
engines floor identically, whereas round differs in half-even vs half-away
tie-breaking.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"

#: language → RE2 stopword/charclass pattern; identical in pyarrow and DuckDB.
#: Precedence order (first max wins) is the dict order below; all-zero → und.
LANG_PATTERNS: dict[str, str] = {
    "zh": r"\p{Han}",
    "de": r"\b(der|die|und|das|ist|nicht|ein|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|pas|vous)\b",
    "es": r"\b(el|los|las|es|una|que|por|con)\b",
    "en": r"\b(the|and|is|of|to|a|in|that)\b",
}

EN_STOPWORDS_RE = LANG_PATTERNS["en"]


def floor_k(x, k: int = 4):
    """floor(x * 10^k) / 10^k — deterministic float truncation shared with
    the SQL mirror ``floor(x * 10000) / 10000``."""
    scale = float(10**k)
    return pc.divide(pc.floor(pc.multiply(x, scale)), scale)


def token_count(text: pa.ChunkedArray | pa.Array):
    """Whitespace token count.

    SQL mirror: ``CASE WHEN trim(text) = '' THEN 0
    ELSE len(string_split_regex(trim(text), '\\s+')) END``
    """
    return pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())


def char_count(text):
    """SQL mirror: ``length(text)`` (both count codepoints)."""
    return pc.cast(pc.utf8_length(text), pa.int64())


def pattern_count(text, pattern: str):
    """SQL mirror: ``len(regexp_extract_all(text, pattern))``."""
    return pc.cast(pc.count_substring_regex(text, pattern), pa.int64())


def quality_features(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Per-document quality features + composite score.

    SQL mirror (see ``__ray_entry__.oracle_sql['text_quality']``):
      n_chars        = length(text)
      n_tokens       = token_count mirror above
      chars_no_ws    = length(regexp_replace(text, '\\s', '', 'g'))
      mean_token_len = floor(chars_no_ws / n_tokens * 10000)/10000   (0 if no tokens)
      upper_ratio    = floor(n_upper / n_chars * 10000)/10000        (0 if empty)
      digit_ratio    = floor(n_digit / n_chars * 10000)/10000
      stop_ratio     = floor(n_stop / n_tokens * 10000)/10000
      quality_score  = floor( least(n_tokens,200)/200.0
                              * (1 - upper_ratio) * (1 - digit_ratio)
                              * 10000 ) / 10000
    """
    text = batch.column(text_col)
    n_chars = char_count(text)
    n_tokens = token_count(text)
    chars_no_ws = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, r"\s", "")), pa.int64()
    )
    n_upper = pattern_count(text, r"[A-Z]")
    n_digit = pattern_count(text, r"[0-9]")
    n_stop = pattern_count(pc.utf8_lower(text), EN_STOPWORDS_RE)

    f_tokens = pc.cast(n_tokens, pa.float64())
    f_chars = pc.cast(n_chars, pa.float64())
    safe_tokens = pc.if_else(pc.equal(n_tokens, 0), pa.scalar(1.0), f_tokens)
    safe_chars = pc.if_else(pc.equal(n_chars, 0), pa.scalar(1.0), f_chars)
    zero = pa.scalar(0.0)

    mean_token_len = pc.if_else(
        pc.equal(n_tokens, 0),
        zero,
        floor_k(pc.divide(pc.cast(chars_no_ws, pa.float64()), safe_tokens)),
    )
    upper_ratio = pc.if_else(
        pc.equal(n_chars, 0),
        zero,
        floor_k(pc.divide(pc.cast(n_upper, pa.float64()), safe_chars)),
    )
    digit_ratio = pc.if_else(
        pc.equal(n_chars, 0),
        zero,
        floor_k(pc.divide(pc.cast(n_digit, pa.float64()), safe_chars)),
    )
    stop_ratio = pc.if_else(
        pc.equal(n_tokens, 0),
        zero,
        floor_k(pc.divide(pc.cast(n_stop, pa.float64()), safe_tokens)),
    )
    capped = pc.if_else(pc.greater(f_tokens, 200.0), pa.scalar(200.0), f_tokens)
    score = floor_k(
        pc.multiply(
            pc.multiply(
                pc.divide(capped, 200.0), pc.subtract(1.0, upper_ratio)
            ),
            pc.subtract(1.0, digit_ratio),
        )
    )
    feature_cols = [
        ("n_chars", n_chars),
        ("n_tokens", n_tokens),
        ("mean_token_len", mean_token_len),
        ("upper_ratio", upper_ratio),
        ("digit_ratio", digit_ratio),
        ("stop_ratio", stop_ratio),
        ("quality_score", score),
    ]
    taken = {text_col, *(n for n, _ in feature_cols)}
    out = batch.select([c for c in batch.column_names if c not in taken])
    for name, col in feature_cols:
        out = out.append_column(name, col)
    return out




def langid(batch: pa.Table, *, text_col: str = "text", out_col: str = "lang_pred") -> pa.Table:
    """N-gram/stopword-heuristic language id over :data:`LANG_PATTERNS`.

    Deterministic argmax with dict-order precedence (first max wins);
    all-zero counts → ``"und"``. The SQL mirror is a nested CASE with the
    same precedence (``__ray_entry__.oracle_sql['text_langid']``).
    """
    lower = pc.utf8_lower(batch.column(text_col))
    counts = np.stack(
        [
            pc.count_substring_regex(
                batch.column(text_col) if lang == "zh" else lower, pat
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for lang, pat in LANG_PATTERNS.items()
        ]
    )
    langs = np.array(list(LANG_PATTERNS), dtype=object)
    pick = langs[np.argmax(counts, axis=0)]
    pick = np.where(counts.sum(axis=0) == 0, "und", pick)
    return batch.append_column(out_col, pa.array(pick, pa.string()))


def fingerprint_md5(batch: pa.Table, *, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    """Content fingerprint = hex MD5 of the UTF-8 text.

    SQL mirror: ``md5(text)``. (MD5 here is a fingerprint, not a security
    primitive.) Per-row hashlib is acceptable: MD5 of short strings is
    ~1µs/row and this stage parallelizes across blocks; the scale path for
    pure dedup keys is :func:`content_hash64`.
    """
    texts = batch.column(text_col).to_pylist()
    fps = [
        None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in texts
    ]
    return batch.append_column(out_col, pa.array(fps, pa.string()))


def content_hash64(batch: pa.Table, *, text_col: str = "text", out_col: str = "h64") -> pa.Table:
    """Fast vectorized 64-bit content hash via polars' xxhash — the scale
    path for exact-dedup keys (stable within one polars version; use
    :func:`fingerprint_md5` when cross-system stability matters)."""
    import polars as pl

    h = pl.from_arrow(batch.select([text_col]))[text_col].hash(seed=42)
    return batch.append_column(out_col, pa.array(h.to_numpy(), pa.uint64()))


def rolling_fingerprint(
    batch: pa.Table, *, text_col: str = "text", window: int = 64, out_col: str = "winnow64"
) -> pa.Table:
    """Winnowing-style document fingerprint: min of rolling polynomial
    hashes over byte windows (deterministic; used for containment-ish
    near-dup screening). Vectorized per document with numpy."""
    B, P = np.uint64(257), np.uint64(0xFFFFFFFFFFFFFFC5)
    out = np.zeros(batch.num_rows, dtype=np.uint64)
    texts = batch.column(text_col).to_pylist()
    # uint64 wraparound is intended here (mod-2^64 mixing on top of mod P):
    # the fingerprint only needs determinism, not number theory
    np_err = np.seterr(over="ignore")
    for i, t in enumerate(texts):
        if not t:
            continue
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(data) <= window:
            h = np.uint64(0)
            for b in data:
                h = (h * B + b) % P
            out[i] = h
        else:
            # rolling hash over all windows, take min (vectorized cumulative)
            pw = np.uint64(1)
            for _ in range(window - 1):
                pw = (pw * B) % P
            h = np.uint64(0)
            hashes = np.empty(len(data) - window + 1, dtype=np.uint64)
            for j, b in enumerate(data[:window]):
                h = (h * B + b) % P
            hashes[0] = h
            for j in range(window, len(data)):
                h = ((h - (data[j - window] * pw) % P + P) * B + data[j]) % P
                hashes[j - window + 1] = h
            out[i] = hashes.min()
    np.seterr(**np_err)
    return batch.append_column(out_col, pa.array(out, pa.uint64()))


def json_int_field(
    batch: pa.Table,
    *,
    col: str,
    key: str,
    out_col: str | None = None,
) -> pa.Table:
    """Extract an integer field from a JSON-string column with one RE2 pass
    (``pc.extract_regex`` — no per-row ``json.loads``): rows without the key
    (or with null/invalid JSON) yield null. Right for flat numeric fields in
    high-volume telemetry columns; arbitrarily nested payloads go through
    the full flattener in ``sources/json_source.py`` instead.

    SQL mirror: ``CAST(json_extract_string(col, '$.key') AS BIGINT)``.
    Reference analog: the JSONPath projection of ``sources/json_source.py``
    (reference ``sources/json_source.py:57-97``), applied column-wise."""
    import re as _re

    pattern = f'"{_re.escape(key)}"\\s*:\\s*(?P<v>-?\\d+)'
    m = pc.extract_regex(batch.column(col), pattern=pattern)
    vals = pc.cast(pc.struct_field(m, "v"), pa.int64())
    return batch.append_column(out_col or key, vals)


def normalize_text(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "text_norm"
) -> pa.Table:
    """Standard corpus text normalization in pure Arrow kernels: lowercase,
    collapse all whitespace runs to single spaces, trim. One of the cheap
    always-on cleanup stages of a training-data pipeline (applied before
    shingling/fingerprinting so near-dup detection is whitespace-insensitive).

    SQL mirror: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    x = pc.utf8_lower(batch.column(text_col))
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    return batch.append_column(out_col, x)


#: (name, RE2 pattern, replacement) applied IN ORDER — counts for a category
#: are taken on the text as it stands before that category's replacement, so
#: the SQL mirror is the same chain of nested regexp_replace/regexp_extract_all
#: (both engines are RE2: identical match semantics, greediness, word
#: boundaries). Order matters: emails first (their digits must not feed the
#: phone pattern), then dotted quads, then phone-shaped digit runs.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()\-\s]{6,}\d", "<PHONE>"),
)


def pii_scrub(
    batch: pa.Table, *, text_col: str = "text", out_col: str | None = None
) -> pa.Table:
    """Redact emails, dotted-quad IPs and phone-shaped digit runs with
    typed placeholder tokens, appending per-category match counts.

    SQL mirror (DuckDB, same RE2 patterns ``p_email p_ip p_phone``)::

        WITH s1 AS (SELECT *, len(regexp_extract_all(text, p_email)) n_email,
                    regexp_replace(text, p_email, '<EMAIL>', 'g') t1 FROM t),
        s2 AS (SELECT *, len(regexp_extract_all(t1, p_ip)) n_ip,
               regexp_replace(t1, p_ip, '<IP>', 'g') t2 FROM s1),
        s3 AS (SELECT *, len(regexp_extract_all(t2, p_phone)) n_phone,
               regexp_replace(t2, p_phone, '<PHONE>', 'g') t3 FROM s2) ...

    NULL text stays NULL with NULL counts (regexp over NULL is NULL in
    both engines). A per-batch ``map_batches`` stage — no state, no
    shuffle, streams at any scale."""
    out = out_col or text_col
    t = batch.column(text_col)
    if pa.types.is_null(t.type) or (
        batch.num_rows == 0 and not pa.types.is_string(t.type)
    ):
        # all-NULL blocks infer `null`; an empty pandas frame infers
        # float64 — both carry no text to scrub
        t = t.cast(pa.string())
    counts: dict[str, pa.Array] = {}
    for name, pat, repl in PII_RULES:
        counts[f"n_{name}"] = pattern_count(t, pat)
        t = pc.replace_substring_regex(t, pat, replacement=repl)
    if out in batch.column_names:
        batch = batch.set_column(
            batch.column_names.index(out), out, t
        )
    else:
        batch = batch.append_column(out, t)
    for c, arr in counts.items():
        batch = batch.append_column(c, arr)
    return batch.replace_schema_metadata(None)


def repetition_features(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Gopher-style repetition metrics per document: word totals/distincts,
    the most-frequent word's share of all words, and the duplicate-line
    fraction. Words are the non-empty whitespace splits (the engine-wide
    token definition, :func:`token_count`); lines split on ``\\n``.

    Output: ``(id, n_words, n_distinct_words, top_word_frac, n_lines,
    dup_line_frac)``; ratios are floored at 4 decimals (:func:`floor_k`)
    like every float the oracle compares. NULL text → zero-word,
    zero-line document. Per-batch and stateless — the explode/groupby
    runs in C on the batch's own rows only.

    SQL mirror: unnest words → ``GROUP BY doc, word`` → per-doc
    ``sum/count/max``; lines via ``len(string_split(text, chr(10)))`` vs
    ``len(list_distinct(...))``."""
    import pandas as pd

    text = batch.column(text_col)
    if pa.types.is_null(text.type):
        text = text.cast(pa.string())
    nrows = batch.num_rows
    filled = text.fill_null("")

    toks = pc.split_pattern_regex(filled, r"\s+")
    lens = pc.list_value_length(toks).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    row_of = np.repeat(np.arange(nrows), lens)
    keep = np.asarray(pc.not_equal(flat, ""))
    n_words = np.zeros(nrows, dtype=np.int64)
    n_distinct = np.zeros(nrows, dtype=np.int64)
    top_c = np.zeros(nrows, dtype=np.int64)
    if keep.any():
        wdf = pd.DataFrame(
            {"row": row_of[keep], "word": flat.filter(pa.array(keep))}
        )
        per = wdf.groupby(["row", "word"], sort=False).size()
        agg = per.groupby(level=0).agg(["sum", "count", "max"])
        idx = agg.index.to_numpy()
        n_words[idx] = agg["sum"].to_numpy()
        n_distinct[idx] = agg["count"].to_numpy()
        top_c[idx] = agg["max"].to_numpy()

    lines = pc.split_pattern(filled, "\n")
    n_lines = pc.list_value_length(lines).fill_null(0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    null_mask = np.asarray(text.is_null())
    n_lines[null_mask] = 0  # SQL: NULL text has no lines
    lflat = pc.list_flatten(lines)
    if isinstance(lflat, pa.ChunkedArray):
        lflat = lflat.combine_chunks()
    lrow = np.repeat(np.arange(nrows), np.asarray(
        pc.list_value_length(lines).fill_null(0)
    ))
    n_distinct_lines = np.zeros(nrows, dtype=np.int64)
    if len(lrow):
        ldf = pd.DataFrame({"row": lrow, "line": lflat})
        ld = ldf.groupby("row", sort=False)["line"].nunique()
        n_distinct_lines[ld.index.to_numpy()] = ld.to_numpy()
    n_distinct_lines[null_mask] = 0

    with np.errstate(divide="ignore", invalid="ignore"):
        twf = np.where(
            n_words > 0, top_c / np.maximum(n_words, 1) * 10000.0, 0.0
        )
        dlf = np.where(
            n_lines > 0,
            (n_lines - n_distinct_lines) / np.maximum(n_lines, 1) * 10000.0,
            0.0,
        )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "top_word_frac": pa.array(np.floor(twf) / 10000.0),
            "n_lines": pa.array(n_lines),
            "dup_line_frac": pa.array(np.floor(dlf) / 10000.0),
        }
    )
