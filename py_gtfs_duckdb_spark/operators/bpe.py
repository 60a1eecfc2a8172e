"""Byte-pair-encoding tokenizer, dependency-free: train merges on a
deterministic corpus sample, tokenize distributed.

Token COUNTING by regex (operators/text.py:token_count) approximates
training cost; a real pipeline budgets in the model's own subword units.
This is the classic word-internal BPE (Sennrich et al. 2016): words are
character sequences with an end-of-word marker, and training greedily
merges the most frequent adjacent symbol pair. Everything is
deterministic — the sample is md5-ordered, and frequency ties break
lexicographically — so two training runs (or two engines) produce the
same merge table.

Scale shape: two trainers with one contract. :func:`bpe_train` reads
``sample_size`` documents to the driver (explicit bound — industry
practice trains tokenizers on a sample); :func:`bpe_train_distributed`
learns the IDENTICAL merge list as combinable aggregations over the
distributed (word, freq) vocabulary — one corpus pass, then one
argmax row per merge to the driver (cost model: SCALING.md §13).
Encoding is a narrow Arrow-batched pass with the merge ranks in the
task closure and a per-batch word memo (word-soup corpora repeat words
heavily, so the memo turns per-word merge loops into dict hits).
Training is not SQL-expressible (iterative argmax); correctness is
pinned by hand-computable merge tests, the sampled↔distributed
differential, and the reconstruction property.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"  # end-of-word marker, standard BPE

# Symbol-boundary separator for the ordered-replace encoder. Each symbol
# is wrapped as SEP+sym+SEP, so a merge (l, r) is the literal string
# rewrite SEP+l+SEP+SEP+r+SEP -> SEP+lr+SEP and adjacent matches never
# share characters (left-to-right non-overlapping replace == one
# left-to-right BPE merge pass). 0x1f (ASCII unit separator) cannot
# occur in tokenizable text that survives quality filtering, and the
# testdata corpus is strictly [a-z ].
SEP = "\x1f"

# A frozen merge table (trained once with bpe_train(n_merges=24,
# sample_size=500) on the sf0.01 documents sample and pasted as
# literals) so encoding is a STATIC rewriting system both engines can
# replay: the Spark side folds it into nested replace() expressions, the
# DuckDB oracle into the identical nested replace() SQL — the same
# fixed-constants trick that made the ANN tier oracle-able
# (plans/ann_oracles.py). Training itself stays API-only (a learned
# merge table is data-dependent state no static SQL can reproduce).
FIXED_MERGES_V1: list[tuple[str, str]] = [
    ("e", "r"), ("e", EOW), ("n", EOW), ("er", EOW),
    ("o", "w"), ("ow", EOW), ("o", "r"), ("s", "t"),
    ("h", EOW), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", EOW), ("g", EOW), ("y", EOW), ("a", "r"),
    ("p", "ar"), ("t", EOW), ("i", "n" + EOW), ("j", "o"),
    ("jo", "in" + EOW), ("a", "s"), ("as", "h" + EOW), ("h", "ash" + EOW),
]

# Full-memorization frozen table (bpe_train(n_merges=600, sample_size=8000,
# min_pair_freq=1) on the sf0.01 documents sample, pasted as literals):
# training ran until no adjacent pair was left, at which point every
# corpus word is a single token — the generator vocabulary is a CLOSED
# 31-word set, identical at sf0.001/0.01/0.1, so that fixpoint is 106
# merges and every one of them fires on the corpus. Prefix-compatible
# with FIXED_MERGES_V1 (same training order, longer run).
FIXED_MERGES_MEMO: list[tuple[str, str]] = [
    ("e", "r"), ("e", EOW), ("n", EOW),
    ("er", EOW), ("o", "w"), ("ow", EOW),
    ("o", "r"), ("s", "t"), ("h", EOW),
    ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", EOW), ("g", EOW), ("y", EOW),
    ("a", "r"), ("p", "ar"), ("t", EOW),
    ("i", "n" + EOW), ("j", "o"), ("jo", "in" + EOW),
    ("a", "s"), ("as", "h" + EOW), ("h", "ash" + EOW),
    ("r", "ow" + EOW), ("at", "c"), ("atc", "h" + EOW),
    ("b", "atch" + EOW), ("a", "n" + EOW), ("c", "an" + EOW),
    ("s", "can" + EOW), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n" + EOW),
    ("cu", "st"), ("cust", "o"), ("custo", "m"),
    ("custom", "er" + EOW), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er" + EOW), ("a", "l"),
    ("al", "l"), ("all", EOW), ("m", "all" + EOW),
    ("s", "mall" + EOW), ("er", "g"), ("erg", "e" + EOW),
    ("l", "ow" + EOW), ("m", "erge" + EOW), ("s", "low" + EOW),
    ("c", "t"), ("ct", "or"), ("ctor", EOW),
    ("d", "er" + EOW), ("e", "ctor" + EOW), ("or", "der" + EOW),
    ("v", "ector" + EOW), ("in", "e" + EOW), ("l", "ine" + EOW),
    ("a", "b"), ("ab", "l"), ("abl", "e" + EOW),
    ("at", "a" + EOW), ("d", "ata" + EOW), ("t", "able" + EOW),
    ("p", EOW), ("u", "p" + EOW), ("a", "g"),
    ("ag", "g" + EOW), ("a", "lu"), ("alu", "e" + EOW),
    ("v", "alue" + EOW), ("e", "y" + EOW), ("k", "ey" + EOW),
    ("a", "m"), ("am", EOW), ("e", "am" + EOW),
    ("r", "eam" + EOW), ("st", "ream" + EOW), ("d", "ow" + EOW),
    ("in", "dow" + EOW), ("w", "indow" + EOW), ("k", EOW),
    ("par", "k" + EOW), ("s", "park" + EOW), ("g", "r"),
    ("gr", "o"), ("gro", "up" + EOW), ("par", "t" + EOW),
    ("b", "i"), ("bi", "g" + EOW), ("or", "t" + EOW),
    ("s", "ort" + EOW), ("er", "y" + EOW), ("q", "u"),
    ("qu", "ery" + EOW), ("a", "st"), ("ast", EOW),
    ("f", "ast" + EOW), ("h", "e" + EOW), ("t", "he" + EOW),
    ("d", "up" + EOW),
]

# Production-DEPTH frozen table: the 106 real memorization merges padded
# with deterministic digit-led pairs to 384 entries. Digits cannot occur
# in the [a-z ] corpus (and the encoders sanitize the SEP byte), so each
# pad is a verified NO-OP on both engines — its only job is to make the
# table longer than MAX_EXPR_MERGES (256) and land on the measured 384
# Catalyst expression cliff, forcing the automatic Arrow dispatch in
# :func:`bpe_encode_stats` / :func:`bpe_vocab_spectrum` down the
# :func:`bpe_tokenize` path a real 32k-merge vocabulary would take. A
# naturally-deep table is impossible on a 31-word closed vocabulary;
# padding is the honest way to drive the deep path against an exact
# oracle (the DuckDB replay stages ALL 384 replaces, so the no-op
# property is itself hash-checked — see plans/extensions.py).
FIXED_MERGES_LARGE: list[tuple[str, str]] = FIXED_MERGES_MEMO + [
    ("0", f"pad{i}") for i in range(384 - len(FIXED_MERGES_MEMO))
]


def _word_freqs(texts) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def bpe_train(
    docs: DataFrame,
    n_merges: int = 200,
    sample_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_freq: int = 2,
) -> dict:
    """Learn ``n_merges`` BPE merges from an md5-ordered document sample.
    Returns {"merges": [[left, right], ...]} — plain data, shippable in a
    task closure. Deterministic: ties in pair frequency break on the
    lexicographically smallest pair. Training stops when the best pair
    occurs fewer than ``min_pair_freq`` times: the default 2 refuses
    merges that fire once in the sample (pure memorization);
    ``min_pair_freq=1`` deliberately memorizes — how the deep frozen
    table :data:`FIXED_MERGES_LARGE` was produced."""
    rows = (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(sample_size)
        .collect()
    )
    freqs = _word_freqs(r.t for r in rows)
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], n) for w, n in sorted(freqs.items())
    ]
    merges: list[list[str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_freq:
            break  # below the repeat floor — see the docstring
        merges.append([best[0], best[1]])
        joined = best[0] + best[1]
        new_words = []
        for syms, n in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, n))
        words = new_words
    return {"merges": merges}


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# Hard ceiling for the expression-tree encoder. Each merge nests one more
# Replace node, and Catalyst's recursive column-node/analysis passes blow
# the default JVM thread stack on deep trees: measured at sf0.1 (padded
# merge tables so every chain is full length), 256 merges analyze in
# 0.6 s and execute in ~0.15 s, 320 still works (~0.66 s exec — per-merge
# cost is linear, each replace is one string pass), but 384+ dies with
# java.lang.StackOverflowError inside ColumnNodeToExpressionConverter
# BEFORE any data is touched. 256 leaves margin under the measured
# 320/384 cliff without relying on a bigger -Xss. Production-scale merge
# tables (32k) must use the Arrow-batched ``bpe_tokenize`` path instead —
# its per-batch word memo amortizes the merge loop and it has no
# expression-depth limit.
MAX_EXPR_MERGES = 256


def bpe_encode_word_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Encoded symbol string of one word under a FIXED merge table, as a
    pure column expression: the word's characters wrapped SEP+c+SEP, the
    wrapped EOW appended, then every merge applied IN LEARNED ORDER as a
    literal left-to-right string replace. For a merge table produced by
    BPE training this in-order rewriting yields the same segmentation as
    the greedy lowest-rank loop in :func:`_encode_word` (Sennrich 2016
    applies merges in order; the rank priority queue is an optimization)
    — pinned empirically against the corpus by
    tests/test_bpe.py::test_ordered_replace_matches_greedy_encoder.

    Token count of the result = count(SEP)/2 (each symbol carries
    exactly two separators). Kept JVM-side: ~1 regexp + len(merges)
    replaces per word, no UDF, no shuffle. Merge tables larger than
    :data:`MAX_EXPR_MERGES` are rejected (Catalyst stack-overflows on
    the nested expression tree — see the constant's measurement notes);
    use :func:`bpe_tokenize` for production-sized tables."""
    if len(merges) > MAX_EXPR_MERGES:
        raise ValueError(
            f"{len(merges)} merges exceed MAX_EXPR_MERGES="
            f"{MAX_EXPR_MERGES}: the nested-replace expression encoder "
            "stack-overflows Catalyst beyond ~320 merges (measured; see "
            "operators/bpe.py). Use bpe_tokenize (Arrow-batched, "
            "memoized) for large merge tables."
        )
    s = F.concat(
        F.regexp_replace(word, "(.)", SEP + "$1" + SEP),
        F.lit(SEP + EOW + SEP),
    )
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(SEP + left + SEP + SEP + right + SEP),
            F.lit(SEP + left + right + SEP),
        )
    return s


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    use_arrow: bool | None = None,
) -> DataFrame:
    """(doc_id, n_words, n_chars, n_bpe_tokens, chars_per_token): apply a
    FIXED merge table (default :data:`FIXED_MERGES_V1`) and count subword
    tokens per document — the budget signal a training pipeline reads
    (regex token_count approximates it; this IS the model's unit).

    Scale shape: one narrow projection — per-word encode via
    :func:`bpe_encode_word_expr` inside a single array transform, token
    count derived from separator counts on the concatenated encoding.
    No explode, no shuffle, no UDF; Catalyst prunes the scan to
    (id, text).

    Raw input text is sanitized of the SEP byte first (a stray 0x1f
    would otherwise forge symbol boundaries and corrupt the separator-
    derived counts — this operator runs on PRE-filter corpora via the
    audit CLI, so the 'filtered text never contains 0x1f' assumption
    does not hold here).

    DISPATCH: merge tables past :data:`MAX_EXPR_MERGES` automatically
    take the Arrow-batched greedy path (:func:`_bpe_stats_arrow`, the
    same kernel as :func:`bpe_tokenize`) instead of raising — a
    production 32k-merge vocabulary must not depend on Catalyst's
    expression-depth ceiling. Same output, same rounding; the two paths
    agree wherever ordered-replace ≡ greedy holds (tests/test_bpe.py
    pins it for every frozen table on the corpus vocabulary).

    ``use_arrow=True`` forces the Arrow kernel for shallow tables too.
    The trade (measured r14, interleaved at sf0.1): per EXECUTED row the
    Arrow kernel is ~5x faster (0.19x, tools/ab_bpe_vocab.py stats mode
    — the expression path's per-word replace chain is an interpreted
    HOF, and the memo collapses the closed vocabulary to dict hits), but
    the expression form is a LAZY projection Catalyst can prune —
    a consumer that never reads the encode columns pays nothing, while
    a MapInPandas always executes. Default ``None`` keeps the prunable
    expression form under the depth ceiling; consumers that always
    aggregate the counts (q_bpe_fertility) pass ``use_arrow=True``."""
    merges = FIXED_MERGES_V1 if merges is None else merges
    if use_arrow or len(merges) > MAX_EXPR_MERGES:
        return _bpe_stats_arrow(docs, merges, text_col, id_col, keep_cols)
    text = F.replace(F.col(text_col), F.lit(SEP))
    words = F.filter(F.split(text, " "), lambda w: w != "")
    enc_doc = F.concat_ws(
        "", F.transform(words, lambda w: bpe_encode_word_expr(w, merges))
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        F.size(words).cast("bigint").alias("n_words"),
        F.length(F.replace(text, F.lit(" ")))
        .cast("bigint")
        .alias("n_chars"),
        # guard: concat_ws over the null words array yields "" (not
        # null), so without the when() a NULL document would count 0
        # tokens while n_words/n_chars null-propagate — null text must
        # yield ALL-null stats, identically on both dispatch paths
        F.when(
            F.col(text_col).isNotNull(),
            (
                (F.length(enc_doc) - F.length(F.replace(enc_doc, F.lit(SEP))))
                / 2
            ).cast("bigint"),
        ).alias("n_bpe_tokens"),
    )
    from py_gtfs_duckdb_spark.functions import pround

    return d.withColumn(
        "chars_per_token",
        F.when(
            F.col("n_bpe_tokens") > 0,
            pround(F.col("n_chars") / F.col("n_bpe_tokens"), 4),
        ),
    )


def _bpe_stats_arrow(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    id_col: str,
    keep_cols: tuple[str, ...],
) -> DataFrame:
    """:func:`bpe_encode_stats` for merge tables too deep for the
    expression encoder: one narrow Arrow-batched ``mapInPandas`` pass
    with the merge ranks in the task closure and a per-batch word memo
    (the :func:`bpe_tokenize` kernel, counting instead of materializing
    token arrays). Mirrors the expression path's definitions exactly —
    SEP-sanitize, split on ' ' dropping empties, n_chars = non-space
    length — and applies the shared ``pround`` ratio JVM-side so the
    hash-checked columns are bit-identical to the shallow path.

    Deliberately NO fan_out here (r14 measured): the memoized kernel is
    so cheap per row (dict hits on a closed vocabulary) that the
    round-robin exchange costs more than 32-way parallelism saves
    (0.44 s -> 0.73 s with fan_out at sf0.1) — unlike the md5-dense
    shingle/winnow stages where fan_out was measured to win (r13)."""
    rank = {(left, right): i for i, (left, right) in enumerate(merges)}
    src = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        F.col(text_col).alias("__t"),
    )
    schema = T.StructType(
        [src.schema["doc_id"], *[src.schema[c] for c in keep_cols]]
        + [
            T.StructField("n_words", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        memo: dict[str, int] = {}
        for pdf in batches:
            nw, nc, nt = [], [], []
            for text in pdf["__t"]:
                if text is None:
                    # match the expression path: replace/split/length all
                    # propagate NULL, so a null document yields null stats
                    # rows there — the kernel must not crash nor invent 0s
                    nw.append(None)
                    nc.append(None)
                    nt.append(None)
                    continue
                text = text.replace(SEP, "")
                words = [w for w in text.split(" ") if w]
                nw.append(len(words))
                nc.append(len(text.replace(" ", "")))
                total = 0
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = len(_encode_word(w, rank))
                    total += got
                nt.append(total)
            out = pdf.drop(columns=["__t"])
            out["n_words"] = pd.Series(
                pd.array(nw, dtype="Int64"), index=pdf.index
            )
            out["n_chars"] = pd.Series(
                pd.array(nc, dtype="Int64"), index=pdf.index
            )
            out["n_bpe_tokens"] = pd.Series(
                pd.array(nt, dtype="Int64"), index=pdf.index
            )
            yield out

    from py_gtfs_duckdb_spark.functions import pround

    return src.mapInPandas(run, schema=schema).withColumn(
        "chars_per_token",
        F.when(
            F.col("n_bpe_tokens") > 0,
            pround(F.col("n_chars") / F.col("n_bpe_tokens"), 4),
        ),
    )


def bpe_vocab_spectrum(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(token, n_occurrences, n_docs) for the ``top_k`` most frequent
    subword tokens under a FIXED merge table — the tokenizer-native
    vocabulary audit (which merges actually pay for themselves on this
    corpus; a merge whose token never surfaces is dead weight in the
    vocab budget).

    Scale shape (r14 rework, guide §4.2 + §2.3): ONE Arrow-batched
    ``mapInPandas`` pass encodes (memoized per distinct word per task —
    the same greedy kernel as :func:`bpe_tokenize`) and PRE-AGGREGATES
    per batch, emitting (token, occurrences-in-batch, docs-in-batch)
    rows. Each document is one input row, so batches partition the doc
    set and summing per-batch distinct-doc counts is the exact
    ``n_docs``. The exchange then carries vocabulary×batches rows
    instead of one row per corpus token occurrence, the downstream
    aggregate is two combinable sums (the previous ``countDistinct(id)``
    expanded every token row 2x through an Expand node), and top-k stays
    TakeOrderedAndProject (per-partition heaps), never a global sort.
    Ties break on the token string so the result is deterministic.

    This replaced the shallow-table expression encoder
    (``bpe_encode_word_expr`` inside an array ``transform``): HOFs are
    interpreted (CodegenFallback), so every word occurrence paid
    len(merges) interpreted Replace evaluations; the memoized kernel
    pays one greedy encode per DISTINCT word per task. Measured r14
    (interleaved, sf0.1, tools/ab_bpe_vocab.py): 0.60x before the
    pre-aggregation, values row-identical (ordered-replace ≡ greedy is
    pinned for every frozen table on this corpus by tests/test_bpe.py,
    and the battery oracle hash-checks the output). Input text is
    sanitized of the SEP byte (see :func:`bpe_encode_stats`); works for
    any table depth (no Catalyst expression ceiling)."""
    merges = FIXED_MERGES_V1 if merges is None else merges
    rank = {(left, right): i for i, (left, right) in enumerate(merges)}
    # no fan_out: measured slower for the memoized kernel (see
    # _bpe_stats_arrow's note)
    src = docs.select(F.col(text_col).alias("__t"))
    schema = T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("occ", T.LongType()),
            T.StructField("docs", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            occ: dict[str, int] = {}
            dc: dict[str, int] = {}
            for text in pdf["__t"]:
                if text is None:
                    continue
                wc: dict[str, int] = {}
                for w in text.replace(SEP, "").split(" "):
                    if w:
                        wc[w] = wc.get(w, 0) + 1
                per_doc: dict[str, int] = {}
                for w, c in wc.items():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, rank)
                    for tok in got:
                        per_doc[tok] = per_doc.get(tok, 0) + c
                for tok, c in per_doc.items():
                    occ[tok] = occ.get(tok, 0) + c
                    dc[tok] = dc.get(tok, 0) + 1
            yield pd.DataFrame(
                {
                    "token": pd.Series(list(occ), dtype="object"),
                    "occ": pd.Series(
                        [occ[t] for t in occ], dtype="int64"
                    ),
                    "docs": pd.Series(
                        [dc[t] for t in occ], dtype="int64"
                    ),
                }
            )

    return (
        src.mapInPandas(run, schema=schema)
        .groupBy("token")
        .agg(
            F.sum("occ").cast("bigint").alias("n_occurrences"),
            F.sum("docs").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(top_k)
    )


def bpe_tokenize(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_bpe_tokens): apply the merge table.
    Narrow Arrow-batched pass; per-batch word memo (repeated words cost a
    dict hit, not a merge loop). No fan_out: measured slower here — see
    :func:`_bpe_stats_arrow`'s note (the memo makes per-row work too
    cheap to amortize a repartition exchange)."""
    rank = {
        (left, right): i for i, (left, right) in enumerate(model["merges"])
    }
    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    schema = T.StructType(
        [
            src.schema["id"],
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf["__t"]:
                if text is None:
                    # null document -> null tokens/count (null propagation,
                    # like every expression-path string op), not a crash
                    toks_col.append(None)
                    n_col.append(None)
                    continue
                toks: list[str] = []
                for w in text.split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, rank)
                    toks.extend(got)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "tokens": toks_col,
                    "n_bpe_tokens": pd.Series(
                        pd.array(n_col, dtype="Int64")
                    ),
                }
            )

    return src.mapInPandas(run, schema=schema)


def wide_vocab_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derived wide-vocabulary stress corpus: adjacent word pairs fused
    into compound words ("key agg row scan" → "key_agg row_scan"), turning
    the generator's CLOSED 31-word vocabulary into ~960 compound types
    whose symbol mass supports 1000+ merges — the only way to exercise
    deep-vocabulary training against this testdata (the raw corpus hits
    its merge fixpoint at ~106). Frequencies stay corpus-derived (pair
    frequencies = products of the source stream), so counts are spread,
    not uniform. Used by the bench's 1k-merge line and the batched-
    trainer quality tests."""
    flat = F.array_join(
        F.transform(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""),
            lambda w: F.concat(w, F.lit("_")),
        ),
        "",
    )
    return docs.select(
        F.regexp_replace(flat, r"([a-z]+)_([a-z]+)_", r"$1_$2 ").alias(text_col)
    )


def _select_merge_batch(
    rows, batch_k: int, all_visible: bool, exact: bool = True
) -> list:
    """Largest batch of ranked pair rows PROVABLY equal to sequential
    greedy training, built in two steps.

    Step 1 — maximal non-interfering PREFIX: walk the (cnt desc, l, r
    asc) ranking and keep pairs until one touches a symbol an earlier
    kept pair touches, then STOP (no skip-ahead). Every kept pair
    outranks every unkept snapshot pair; kept pairs' counts are invariant
    under each other's application (disjoint symbols ⇒ merging one
    neither creates nor destroys an adjacency of another); and any pair
    a kept merge creates or reduces is bounded by the snapshot count of
    a pair that INTERFERES with the kept set and therefore ranks below
    the whole prefix. Skip-and-continue would break this: a skipped
    high-count pair only loses part of its count to the merge it
    interferes with and can still outrank the next kept pair.

    Step 2 — boundary-level tie guard: the step-1 bound leaves ONE hole.
    A merge of kept pair (l, r) can CREATE a pair (x, l⊕r) whose count
    equals cnt(x, l) — an interfering pair at the batch's lowest count
    level c — and the created pair's fresh name can win the lexicographic
    tie against a kept level-c pair, so sequential would commit it inside
    this round (observed: (c,o) creating (co,lu) that outranks (lu,m) at
    equal count). So if any visible non-kept row at level c interferes
    with the kept set — or level c is not fully visible in the collected
    rows (``all_visible=False`` and the tail row still sits at c) — the
    batch truncates to the strictly-above-c pairs (or the single top pair
    when the whole batch ties at c; one merge is always exact). Created
    pairs bounded below c can never outrank any kept pair, so deeper
    levels need no guard.

    ``exact=False`` (the trainer's ``strategy="fast"``) drops both
    guarantees for throughput: it SKIPS interfering rows instead of
    stopping and never truncates on boundary ties, so each round commits
    every non-interfering pair in the top-k — the ~k× job collapse a
    32k-merge vocabulary needs. The learned table can then differ from
    sequential greedy in tie/chain corners (a skipped pair or a created
    pair may outrank a committed one), but each round's rewrite is still
    internally consistent (disjoint symbols), and the tokenizer the table
    drives compresses the corpus to the same fixpoint quality
    (differential-tested on n_bpe_tokens).

    Interference checks cover {l, r, l⊕r} symmetrically: a merged
    symbol's STRING can collide with an existing symbol (BPE tokens are
    plain concatenations), which would make the one-pass rewrite
    order-dependent."""
    kept: list = []
    used: set[str] = set()
    for row in rows[:batch_k]:
        syms = (row["l"], row["r"], row["l"] + row["r"])
        if any(s in used for s in syms):
            if exact:
                break
            continue
        kept.append(row)
        used.update(syms)
    if not exact or len(kept) <= 1:
        return kept
    c = kept[-1]["cnt"]
    level_visible = all_visible or (rows and rows[-1]["cnt"] < c)
    unsafe = not level_visible
    if not unsafe:
        for row in rows[len(kept):]:
            if row["cnt"] != c:
                continue
            if (
                row["l"] in used
                or row["r"] in used
                or (row["l"] + row["r"]) in used
            ):
                unsafe = True
                break
    if unsafe:
        strict = [r for r in kept if r["cnt"] > c]
        kept = strict or kept[:1]
    return kept


def bpe_train_distributed(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    min_pair_freq: int = 2,
    batch_merges: int = 1,
    strategy: str = "exact",
) -> dict:
    """:func:`bpe_train` without the driver-side sample: merge learning
    as ``n_merges`` combinable aggregations over the distributed
    (word, freq) vocabulary table — only the per-iteration ARGMAX row
    (one row, via TakeOrdered) ever reaches the driver, so training
    scales with the corpus instead of a fixed sample bound.

    Scale shape: the CORPUS is touched exactly once — one explode +
    map-side-combinable word count (shuffling distinct words, not
    occurrences). Every iteration after that runs over the vocabulary
    state (word-symbol arrays × freq), which is smaller than the corpus
    by the word-repetition factor and SHRINKS as training proceeds:
    fully-merged words (single symbol) can never pair again and are
    dropped from the state. Per iteration: (a) adjacent-pair counts —
    explode + combinable sum, shuffling (symbol-pair, count) rows only;
    (b) argmax — TakeOrderedAndProject, ONE row collected; (c) merge
    application — a narrow per-row string rewrite (the same SEP-wrapped
    replace the expression encoder uses, so left-to-right non-overlapping
    semantics match :func:`bpe_train`'s greedy scan exactly), followed by
    an eager ``localCheckpoint`` that truncates the lineage (200
    iterations of nested replaces would otherwise rebuild the same
    Catalyst expression cliff :data:`MAX_EXPR_MERGES` guards against —
    measured in SCALING.md §12). On a real cluster swap localCheckpoint
    for a reliable ``checkpoint`` dir; the vocabulary state it
    materializes is vocab-sized, not corpus-sized.

    Determinism matches :func:`bpe_train` tie for tie: highest pair
    count, then lexicographically smallest (left, right) (both engines
    compare ASCII byte order), and the same ``min_pair_freq`` stop rule —
    differential-pinned in tests/test_bpe.py. Cost model: ~2 tiny jobs ×
    n_merges after the single corpus pass; see SCALING.md.

    ``batch_merges > 1`` is the SCALE path (VERDICT r10 Next #3): real
    vocabularies are 32k–64k merges, and one scheduler round-trip per
    merge is hours of pure latency at that depth. Each round collects the
    top ranked pairs (still ONE TakeOrdered job) and applies a batch of
    them in one rewrite pass. Two strategies (:func:`_select_merge_batch`):

    - ``strategy="exact"`` (default): maximal non-interfering PREFIX plus
      a boundary-tie guard — the learned merge list is provably equal to
      sequential training up to tie order inside a round. Realized batch
      size is corpus-dependent: symbol interference among the top pairs
      caps it hard on small-alphabet/tie-heavy corpora (measured ~1.2×
      on the wide-vocab stress corpus — the honest number; SCALING.md
      §13 shows WHY plain non-interference is not sufficient for parity:
      a merge of (c,o) creates (co,lu) whose count ties the boundary
      level and wins the lexicographic tie-break).
    - ``strategy="fast"``: skip-and-continue over the top ``batch_merges``
      rows, no tie guard — the ~k× job collapse, trading exact
      merge-table parity in tie/chain corners for throughput (the table
      still drives the tokenizer to equivalent compression; tested on
      n_bpe_tokens). This is the mode a real 32k-merge training run
      wants.

    ``batch_merges=1`` is byte-for-byte the historical sequential
    trainer.

    Returns ``{"merges": [[l, r], ...], "rounds": [n1, n2, ...]}`` —
    ``rounds`` records how many merges each round committed (all 1s when
    sequential), so differential tests can compare per-round SETS."""
    if strategy not in ("exact", "fast"):
        raise ValueError(
            f"strategy must be 'exact' or 'fast', got {strategy!r}"
        )
    state = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(F.split(F.col("w"), ""), F.array(F.lit(EOW))).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[list[str]] = []
    rounds: list[int] = []
    try:
        while len(merges) < n_merges:
            # over-collect past the batch size so the boundary count
            # level is usually fully visible for the tie guard (still
            # ONE TakeOrdered job, a few hundred tiny rows at most)
            n_fetch = max(1, batch_merges) if batch_merges <= 1 else (
                2 * batch_merges + 8
            )
            best = (
                state.select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1),"
                            " (s, i) -> struct(s AS l, syms[i + 1] AS r))"
                        )
                    ).alias("p"),
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(n_fetch)
                .collect()
            )
            ranked = [r for r in best if r["cnt"] >= min_pair_freq]
            kept = _select_merge_batch(
                ranked,
                batch_merges,
                all_visible=len(best) < n_fetch,
                exact=strategy != "fast",
            )
            kept = kept[: n_merges - len(merges)]
            if not kept:
                break
            merges.extend([r["l"], r["r"]] for r in kept)
            rounds.append(len(kept))
            ws = F.concat_ws(
                "", F.transform("syms", lambda s: F.concat(F.lit(SEP), s, F.lit(SEP)))
            )
            # kept pairs touch disjoint symbols, so the chained replaces
            # commute and one pass equals |kept| sequential greedy passes
            merged = ws
            for row in kept:
                merged = F.replace(
                    merged,
                    F.lit(SEP + row["l"] + SEP + SEP + row["r"] + SEP),
                    F.lit(SEP + row["l"] + row["r"] + SEP),
                )
            nxt = (
                state.select(
                    F.filter(F.split(merged, SEP), lambda x: x != "").alias("syms"),
                    "freq",
                )
                # single-symbol words can never pair again: drop them —
                # the state monotonically shrinks toward the fixpoint
                .filter(F.size("syms") >= 2)
                # lazy: the NEXT iteration's argmax materializes it, so
                # each iteration schedules ONE job instead of two while
                # the lineage still truncates at the checkpoint (measured
                # at sf0.1: same ~21 s wall either way — per-iteration
                # scheduler latency dominates, see SCALING.md — but half
                # the jobs is half the event-log/UI noise)
                .localCheckpoint(eager=False)
            )
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
    return {"merges": merges, "rounds": rounds}
