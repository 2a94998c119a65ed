"""Text-analysis operators over the flat ``documents`` table.

These are the training-data-pipeline operators a 100 TB corpus needs
(language-ID, quality scoring, token counting, fingerprinting). Each is
a single SQL template rendered for Spark SQL *and* DuckDB SQL from
:mod:`tesseract_glue_spark.functions.dialect`, so the DataFrame query
and its correctness oracle are the same text by construction.

Everything stays JVM-side (built-in expressions, whole-stage codegen);
no UDFs anywhere. Derived ratios are emitted as floor-scaled BIGINTs
(``*_x10k``) — never raw doubles — so cross-engine value-hashing is
exact.
"""

from __future__ import annotations

from tesseract_glue_spark.functions import dialect as D

# Marker stopwords per language; \b word-boundary works in Java regex
# (Spark) and RE2 (DuckDB) alike.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|it|was|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu|mit|von)\b",
    "fr": r"\b(le|la|les|et|est|une|dans|que|pour|pas)\b",
    "es": r"\b(el|los|las|es|una|que|por|con|para|como)\b",
    "it": r"\b(il|che|di|non|per|una|sono|con|della|anche)\b",
}
# Deterministic priority order for argmax ties:
LANG_PRIORITY = ["en", "de", "fr", "es", "it"]

EN_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|is|it|that|for|on|with|as)\b"
PUNCT_CLASS = r"[.,;:!?]"


def _norm(d: str, col: str = "text") -> str:
    """lower + collapse whitespace (DuckDB needs the 'g' flag)."""
    if d == D.SPARK:
        return f"lower(regexp_replace(trim({col}), '\\\\s+', ' '))"
    return f"lower(regexp_replace(trim({col}), '\\s+', ' ', 'g'))"


def token_stats_sql(d: str, table: str = "documents") -> str:
    """Per-doc token counts: whitespace tokens + a BPE-ish subword count
    (letter runs, digits, and single punctuation as separate tokens)."""
    bpe = D.regexp_count(d, "text", r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST({D.ws_token_count(d, "text")} AS BIGINT) AS n_tokens_ws,
           CAST({bpe} AS BIGINT) AS n_tokens_bpe
    FROM {table}
    """.strip()


def quality_sql(d: str, table: str = "documents") -> str:
    """Quality scoring from length / punctuation / stopword ratios.

    All-integer arithmetic: component scores are scaled ints, the final
    score their sum — bit-identical across engines.
    """
    n_words = D.ws_token_count(d, "text")
    n_punct = D.regexp_count(d, "text", PUNCT_CLASS)
    n_stop = D.regexp_count(d, f"lower(text)", EN_STOPWORDS)
    punct_x10k = D.scaled_ratio(d, n_punct, "length(text)")
    stop_x10k = D.scaled_ratio(d, n_stop, n_words)
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST({n_words} AS BIGINT) AS n_words,
           {punct_x10k} AS punct_x10k,
           {stop_x10k} AS stop_x10k,
           CAST(least({n_words}, 200) * 50
                + least({stop_x10k} * 5, 10000)
                - least({punct_x10k} * 10, 10000) AS BIGINT) AS quality_score
    FROM {table}
    """.strip()


def langid_sql(d: str, table: str = "documents") -> str:
    """N-gram/stopword-heuristic language ID with deterministic
    fixed-priority tie-breaking (en > de > fr > es > it > und)."""
    counts = {
        lang: D.regexp_count(d, "lower(text)", pat) for lang, pat in LANG_MARKERS.items()
    }
    score_cols = ",\n           ".join(
        f"CAST({expr} AS BIGINT) AS score_{lang}" for lang, expr in counts.items()
    )
    # argmax CASE chain over the aliased scores (computed in a subquery)
    others = {
        lang: [f"score_{o}" for o in LANG_PRIORITY if o != lang] for lang in LANG_PRIORITY
    }
    chain = " ".join(
        f"WHEN score_{lang} > 0 AND score_{lang} >= greatest({', '.join(others[lang])}) THEN '{lang}'"
        for lang in LANG_PRIORITY
    )
    return f"""
    SELECT doc_id, score_en, score_de, score_fr, score_es, score_it,
           CASE {chain} ELSE 'und' END AS lang_pred
    FROM (
        SELECT doc_id,
           {score_cols}
        FROM {table}
    ) scores
    """.strip()


def fingerprint_sql(d: str, table: str = "documents") -> str:
    """Document fingerprints: md5 of normalized text (exact-dup key) and
    the min-hash of word 5-gram shingles (near-dup-stable rolling-hash
    analogue; winnowing's min-selection over the shingle stream)."""
    norm = _norm(d)
    w = D.ws_tokens(d, "norm")
    nw = D.array_len(d, "w")
    shingle = D.md5_hex(d, D.array_join(d, D.array_slice(d, "w", "i+1", 5)))
    mins = D.array_min(d, D.transform_seq(d, "0", f"{nw} - 5", "i", shingle))
    return f"""
    SELECT doc_id,
           {D.md5_hex(d, "norm")} AS fp_md5,
           CASE WHEN {nw} < 5 THEN {D.md5_hex(d, "norm")} ELSE {mins} END AS fp_shingle_min
    FROM (
        SELECT doc_id, norm, {w} AS w
        FROM (SELECT doc_id, {norm} AS norm FROM {table}) n
    ) t
    """.strip()


TEXT_OPS = {
    "text_token_stats": token_stats_sql,
    "text_quality": quality_sql,
    "text_langid": langid_sql,
    "text_fingerprint": fingerprint_sql,
}
