"""Deduplication operators for LLM-data pipelines (north-star §2.3):
exact (fingerprint hash-groupBy), MinHash LSH, SimHash banding, n-gram /
token-set Jaccard, embedding-cosine near-dup.

Scale ladder (what to use at which size):
- exact:     hash-groupBy — one shuffle on the fingerprint; linear.
- MinHash LSH / SimHash banding: candidates via equal-band join — shuffle
  on band values; near-linear; THE 100 TB path.
- exact Jaccard / all-pairs cosine: quadratic in the candidate block —
  kept as correctness oracles for the LSH paths and for small scopes
  (single source, candidate verification), never the whole corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from featurestore_for_joycastle_java_spark.operators.text import fingerprint, tokens


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical (normalized) content: fingerprint → keeper id +
    copy count. One shuffle on the md5 key; at 100 TB the md5 spreads
    uniformly so no skew."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row per identical content — the min-id row
    (deterministic, unlike dropDuplicates' arbitrary winner)."""
    w = Window.partitionBy(fingerprint(F.col(text_col)))
    return (
        df.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    small_vocab_max: int | None = None,
    bitmask_max_docs: int = 50_000,
    tokenizer=tokens,
) -> DataFrame:
    """Exact token-set Jaccard over all pairs sharing ≥1 token, via an
    inverted-index self-join (explode distinct tokens → equi-join on the
    token). Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard
    rounded to 6 (threshold applied on the rounded value so the result
    SET is reproducible bit-for-bit across engines).

    Quadratic in documents-per-shared-token — correct tool for a bounded
    scope (one source, an LSH candidate bucket), not a whole 100 TB corpus
    (common tokens blow up the join; that's what MinHash LSH is for).

    Measured alternative (r2): ppjoin-style prefix filtering (index only
    each doc's rarest ``|d|-ceil(t|d|)+1`` tokens, verify candidates) was
    implemented and benchmarked — SLOWER here at every fixture scale
    (warm 1.6-2.9s vs 1.0-1.7s naive), because the fixture similarity
    graph is dense: most pairs genuinely clear t=0.6, so candidates ≈ all
    pairs and the extra doc-frequency join + two windows + distinct buy
    nothing. Prefix filtering pays in the sparse-similarity/hot-token
    regime, not here; the naive index stays. A broadcast all-pairs
    array_intersect variant was also measured (r3): 5.2s vs 2.5s warm at
    sf0.1/3-sources — per-pair set-intersection beats per-shared-token
    rows only when candidates << all pairs, which density precludes here.

    Plan shape (r3): the token-set size rides along on every exploded
    token row, so (a) the LENGTH-BAND prune ``t·max(|A|,|B|) ≤ min(|A|,
    |B|)`` — a necessary condition for J ≥ t — applies inside the join,
    BEFORE the pair rows hit the groupBy shuffle, and (b) the old
    per-doc-size groupBy + two post-agg joins disappear (sizes are
    carried as grouping keys, functionally dependent on the ids).

    The exploded token index feeds BOTH sides of the self-join — cache it
    once instead of tokenizing the corpus twice (r4; same lifetime note
    as ``minhash_lsh_pairs``: blocks live until the returned plan is
    GC'd, LRU-evictable meanwhile — bounded storage, never correctness).

    ADAPTIVE SMALL-VOCABULARY PATH (r4): when the corpus's distinct-token
    count is ≤ ``small_vocab_max`` (measured with one count over the
    cached index — the pass is shared, not extra), a tiny vocabulary
    forces the inverted index into its worst case by pigeonhole: every
    token bucket holds ~|docs|·tpd/|vocab| documents and the join emits
    Σ_tok C(bucket, 2) pair-token rows (4.9 M at sf0.1/3-sources, vocab
    31) that all shuffle into the pair aggregation. Instead: dictionary-
    encode tokens (row_number over the ≤1024-row vocab — the only global
    window, on a frame that fits in a cache line), pack each doc's token
    set into ⌈|vocab|/64⌉ longs with a bit_or aggregation, and evaluate
    every (length-band-surviving) pair with bitwise AND + bit_count —
    whole-stage-codegen long ops, no per-token pair rows, no HOFs.
    Measured at sf0.1/3-sources: edges 2.6 s → ~1 s. Enum-like token
    domains (tags, categories, game-event vocabularies — this engine's
    home turf) hit this path; natural-language corpora blow past the
    vocab bound and keep the inverted index. Identical output by
    construction: same distinct-token sets, same intersection counts,
    same 6dp rounding.

    GATING (r5, measurement-derived): the bitmask path is taken only when
    ALL hold — (a) ``n_vocab ≤ small_vocab_max`` (mask fits a few longs);
    (b) ``n_docs ≤ bitmask_max_docs`` (the broadcast mask table stays a
    few MB); (c) the PAIR-COUNT heuristic ``n_docs² ≤ 2·Σ_tok df_tok²`` —
    the bitmask's nested-loop evaluates ~n²/2 codegen long-ANDs while the
    inverted index shuffles ~Σdf²/2 pair-token rows, and a shuffled row
    costs roughly 2 evals (measured, local[8], 15-token sparse docs:
    vocab 1000 @ 10k docs: inverted 4.2 s vs bitmask 4.5 s, n² ≈ 4·Σdf²
    → heuristic picks inverted; @ 20k: 5.5 vs 4.7 s — the tie zone;
    vocab 31 enum corpus @ 10k docs: inverted 15.3 s vs bitmask 3.3 s,
    n² ≈ 0.5·Σdf² → bitmask, and @ 20k docs the inverted index OOMs a
    1 GB heap on ~8×10⁸ pair-token rows while the bitmask finishes —
    so for pigeonholed vocabularies the fallback order matters in BOTH
    directions, which is exactly what the ratio test encodes). The old
    r4 gate (docs-only, 100k bound) admitted ~5×10⁹ evals near the
    bound — minutes of pair arithmetic (ADVICE r4); the pair heuristic
    caps the eval count at twice what the index would shuffle anyway.

    The probe (two small aggregations over the cached token index —
    vocab/docs counts + Σdf²) is an EAGER action at plan-construction
    time, so the fast path is OPT-IN (``small_vocab_max=None`` default,
    ADVICE r4): plain calls stay lazy and keep the inverted index;
    corpus-dedup callers (catalog dedup/round2) pass 1024."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokenizer(F.col(text_col))).alias("tk"),
    ).select(
        "id", F.size("tk").alias("n_toks"), F.explode("tk").alias("tok")
    ).cache()

    if small_vocab_max is not None:
        stats = toks.agg(
            F.countDistinct("tok").alias("v"),
            F.countDistinct("id").alias("d"),
        ).first()
        n_vocab, n_docs = stats["v"], stats["d"]
        if 0 < n_vocab <= small_vocab_max and n_docs <= bitmask_max_docs:
            sum_df2 = (
                toks.groupBy("tok")
                .agg(F.count(F.lit(1)).alias("df"))
                .agg(F.sum(F.col("df") * F.col("df")).alias("s2"))
                .first()["s2"]
            )
            if n_docs * n_docs <= 2 * sum_df2:
                return _bitmask_jaccard_pairs(
                    toks, toks.select("tok").distinct(), n_vocab, threshold
                )

    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            # length-band prune: J(A,B) ≥ t forces the sizes within a
            # factor t of each other — evaluated per pair-token row
            # pre-shuffle, so hopeless pairs never reach the aggregation.
            # The EMITTED condition is on the 6dp-ROUNDED jaccard, which
            # admits unrounded J down to t - 5e-7 — so the prune uses
            # (t - 5e-7), making it exactly necessary for the final
            # filter (r4, ADVICE fix: a pair at J = t - 4e-7 rounds up
            # to t and must survive the prune). The extra 1e-9 absorbs
            # double rounding of t·n at exact boundaries (t·max == min).
            & (F.col("a.n_toks") * (threshold - 5e-7) <= F.col("b.n_toks") + 1e-9)
            & (F.col("b.n_toks") * (threshold - 5e-7) <= F.col("a.n_toks") + 1e-9),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_toks").alias("n_a"),
            F.col("b.n_toks").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.round(
        F.col("n_inter")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        6,
    )
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def _bitmask_jaccard_pairs(
    toks: DataFrame, vocab: DataFrame, n_vocab: int, threshold: float
) -> DataFrame:
    """Small-vocabulary exact Jaccard: token-set bitmasks intersected with
    AND + bit_count. See ``token_jaccard_pairs`` for when this wins.

    The candidate join broadcasts the mask table (|docs| × ~8·n_words
    bytes) and keeps the same length-band prune; emitted pairs require
    ≥ 1 shared token, matching the inverted index's sharing condition
    exactly (empty-intersection pairs never appear there either)."""
    from functools import reduce as _reduce

    dict_df = vocab.withColumn(
        "tid", F.row_number().over(Window.orderBy("tok")) - 1
    )
    n_words = (n_vocab + 63) // 64
    tagged = toks.join(F.broadcast(dict_df), "tok").select(
        "id",
        "n_toks",
        (F.col("tid") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), tid % 64)").alias("bv"),
    )
    masks = tagged.groupBy("id", "n_toks").agg(
        *[
            F.bit_or(
                F.when(F.col("w") == wi, F.col("bv")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias(f"m{wi}")
            for wi in range(n_words)
        ]
    )
    a, b = masks.alias("a"), masks.alias("b")
    n_inter = _reduce(
        lambda acc, wi: acc
        + F.bit_count(F.col(f"a.m{wi}").bitwiseAND(F.col(f"b.m{wi}"))),
        range(1, n_words),
        F.bit_count(F.col("a.m0").bitwiseAND(F.col("b.m0"))),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.id") < F.col("b.id"))
        # same prune + slack as the inverted-index path (see above)
        & (F.col("a.n_toks") * (threshold - 5e-7) <= F.col("b.n_toks") + 1e-9)
        & (F.col("b.n_toks") * (threshold - 5e-7) <= F.col("a.n_toks") + 1e-9),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        n_inter.alias("n_inter"),
        F.col("a.n_toks").alias("n_a"),
        F.col("b.n_toks").alias("n_b"),
    )
    jac = F.round(
        F.col("n_inter")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        6,
    )
    return (
        pairs.filter(F.col("n_inter") >= 1)
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ----------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """SimHash per document, entirely in Catalyst: explode tokens, hash
    each, per-bit signed vote (+1/-1) aggregated, sign → bit.

    One explode + one groupBy(id) shuffle; the ``bits`` conditional sums
    are map-side-combined, so the shuffle carries ``bits`` longs per doc,
    not the tokens. ``token_hash`` defaults to xxhash64 (fastest, but
    Spark-specific → hashes are engine-local); pass
    ``text.md5_hash60`` with ``bits=60`` for the cross-engine variant
    whose values any engine reproduces (full DuckDB oracle)."""
    hash_fn = token_hash if token_hash is not None else F.xxhash64
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("id", hash_fn(F.col("tok")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    g = tok.groupBy("id").agg(*votes)
    # bit 63 would overflow a signed-long literal (1<<63); shiftleft wraps
    # in the JVM (two's complement), which is exactly what we want.
    sim = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(
                F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        ),
        range(bits),
        F.lit(0).cast("long"),
    )
    return g.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """Near-dup candidates via SimHash banding: split the ``bits``-bit
    hash into ``n_bands`` bands; any pair agreeing on a full band is a
    candidate (guaranteed to catch hamming ≤ n_bands-1 by pigeonhole);
    verify with bit_count(xor). Shuffles on band values — near-linear,
    the scalable shape."""
    if bits % n_bands:
        # a non-dividing band count would silently exclude the top
        # bits % n_bands hash bits from every band (precision loss), and
        # n_bands > bits would bucket everything together (quadratic) —
        # same contract as minhash_lsh_pairs' num_perm % n_bands check
        raise ValueError("bits must be divisible by n_bands")
    sh = simhash(df, id_col, text_col, bits=bits, token_hash=token_hash)
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "simhash", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


# --- MinHash LSH (Catalyst-native) ------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_perm: int = 128,
) -> DataFrame:
    """Per-document MinHash signature (``num_perm`` longs), entirely in
    Catalyst: shingle → one base xxhash64 of the string, then ``num_perm``
    cheap long-rehashes ``xxhash64(i, base)``, min-aggregated per doc.

    One explode + one groupBy(id) shuffle; the mins are map-side-combined,
    so the shuffle carries ``num_perm`` longs per doc — not the shingles.
    Seedless (xxhash64 is deterministic) → identical output every run."""
    from featurestore_for_joycastle_java_spark.operators.text import shingles

    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), shingle_k)).alias("s"),
        )
        # hash the string ONCE; permutations rehash the 8-byte long
        .select("id", F.xxhash64("s").alias("h"))
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"m{i}")
        for i in range(num_perm)
    ]
    return base.groupBy("id").agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_jaccard_distance: float = 0.4,
    shingle_k: int = 3,
    num_perm: int = 64,
    n_bands: int = 16,
) -> DataFrame:
    """Near-dup pairs via Catalyst-native MinHash LSH over k-token
    shingles, the 100 TB dedup path:

    1. signature: ``num_perm`` minhashes per doc (one explode + one agg);
    2. candidates: band the signature into ``n_bands`` groups of
       ``num_perm / n_bands`` rows, hash each band to one long, self-join
       on equal (band_idx, band_hash) — shuffle on band hashes,
       near-linear, no quadratic blowup;
    3. verify: EXACT shingle-set Jaccard on the candidate pairs only
       (candidates are a vanishing fraction of all pairs).

    Returns (id_a, id_b, jaccard_dist) with exact 6dp-rounded distance
    ``<= max_jaccard_distance``. Fully deterministic: xxhash64 has no
    seed, banding is positional, verification is exact — every run and
    every cluster size produces the identical pair set (band recall at
    similarity s is 1-(1-s^r)^b; ~0.9998 at s=0.8 with r=4, b=16).
    """
    from featurestore_for_joycastle_java_spark.operators.text import shingles

    if num_perm % n_bands:
        raise ValueError("num_perm must be divisible by n_bands")
    r = num_perm // n_bands

    # The shingle table feeds three plan branches (signatures + both sides
    # of the verify join) — cache it once instead of re-tokenizing 3×.
    # Lifetime note (deliberate): the blocks stay until the returned plan
    # is garbage-collected (Spark's ContextCleaner then unpersists them)
    # and are LRU-evictable under memory pressure meanwhile — callers in
    # a long session pay bounded storage, never a correctness cost. An
    # eager unpersist here is impossible: the plan is returned lazily.
    sh = (
        df.select(
            F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_k).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .cache()
    )
    base = sh.select("id", F.explode("sh").alias("s")).select(
        "id", F.xxhash64("s").alias("h")
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"m{i}")
        for i in range(num_perm)
    ]
    sig = base.groupBy("id").agg(*mins)

    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.xxhash64(
                            *[F.col(f"m{bi * r + j}") for j in range(r)]
                        ).alias("band_hash"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("__sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("__sh_b"))
    n_inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    n_union = F.size("__sh_a") + F.size("__sh_b") - n_inter
    dist = F.round(F.lit(1.0) - n_inter / n_union.cast("double"), 6)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", dist.alias("jaccard_dist"))
        .filter(F.col("jaccard_dist") <= max_jaccard_distance)
    )


def _sig_bands(sig: DataFrame, num_perm: int, n_bands: int) -> DataFrame:
    """Band a ``minhash_signatures`` frame: (id, m0..) → one row per
    (id, band_idx, band_hash), ``n_bands`` rows per doc."""
    r = num_perm // n_bands
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.xxhash64(
                            *[F.col(f"m{bi * r + j}") for j in range(r)]
                        ).alias("band_hash"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")


def minhash_lsh_pairs_incremental(
    base_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    base_sigs: DataFrame | None = None,
    max_jaccard_distance: float = 0.4,
    shingle_k: int = 3,
    num_perm: int = 64,
    n_bands: int = 16,
) -> DataFrame:
    """Incremental corpus dedup: probe a NEW batch against a corpus whose
    MinHash signatures are already PERSISTED — the ingestion-time shape of
    ``minhash_lsh_pairs``. Returns every near-dup pair with >= 1 new-batch
    member: (new × base) and (new × new), NEVER (base × base).

    ``base_sigs``: the persisted signature frame (``minhash_signatures``
    output, read back from storage); computed from ``base_docs`` when
    None. ``base_docs`` is still required — the exact verify re-reads raw
    text, but ONLY for candidate ids (semi-join prune), which is the
    index-lookup pattern: signatures live in the index, text is fetched
    per candidate.

    Composition law (tested): this equals ``minhash_lsh_pairs(base ∪
    new)`` restricted to pairs with at least one new id — identical
    signatures (seedless xxhash64), identical banding, identical exact
    verify, so incremental ingestion never diverges from a full rebuild.

    Scale shape (the whole point): candidate generation joins the
    CORPUS-sized band index against the BATCH-sized band frame — cost
    O(|corpus bands| + |batch bands| + matches) via one hash join; the
    corpus never self-joins, so daily ingestion into a 100 TB corpus pays
    for the batch, not for the corpus².  Both-new pairs fall out of the
    same join (batch bands are unioned into the probe's right side once,
    with ``id_a < id_b`` dedup).

    Ids SHOULD be disjoint between ``base_docs`` and ``new_docs`` (an
    ingestion batch vs the existing corpus); if an id appears on both
    sides it is treated as a re-ingest — the NEW row's text wins in the
    exact verify (base row anti-joined away), and candidate pairs stay
    deduplicated via the ``distinct()`` on the band join."""
    from featurestore_for_joycastle_java_spark.operators.text import shingles

    if num_perm % n_bands:
        raise ValueError("num_perm must be divisible by n_bands")

    if base_sigs is None:
        base_sigs = minhash_signatures(
            base_docs, id_col, text_col, shingle_k=shingle_k, num_perm=num_perm
        )
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, shingle_k=shingle_k, num_perm=num_perm
    )
    corpus_bands = _sig_bands(
        base_sigs.unionByName(new_sigs), num_perm, n_bands
    )
    new_bands = _sig_bands(new_sigs, num_perm, n_bands)

    # one hash join: corpus index × batch probe. id_a < id_b both dedups
    # the two directions of new-new matches and normalizes pair order;
    # base-base pairs are structurally impossible (right side is batch).
    cand = (
        corpus_bands.alias("a")
        .join(
            new_bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
        )
        .distinct()
    )

    # exact verify: fetch raw text for CANDIDATE ids only (semi-join
    # prune before tokenization — at scale this is a point-lookup set,
    # not a corpus scan)
    new_texts = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    )
    # re-ingest guard: an id present in BOTH sides keeps only the new
    # row's text (otherwise the duplicate id would multiply verify-join
    # output rows); anti-join is a no-op for the normal disjoint case
    all_docs = (
        base_docs.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("__t")
        )
        .join(new_texts, "id", "anti")
        .unionByName(new_texts)
    )
    cand_ids = cand.select(F.col("id_a").alias("id")).unionByName(
        cand.select(F.col("id_b").alias("id"))
    )
    # cached: feeds BOTH sides of the verify join (same lifetime contract
    # as the cache in minhash_lsh_pairs above)
    sh = (
        all_docs.join(cand_ids.distinct(), "id", "semi")
        .select("id", shingles(F.col("__t"), shingle_k).alias("sh"))
        .filter(F.size("sh") > 0)
        .cache()
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("__sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("__sh_b"))
    n_inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    n_union = F.size("__sh_a") + F.size("__sh_b") - n_inter
    dist = F.round(F.lit(1.0) - n_inter / n_union.cast("double"), 6)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", dist.alias("jaccard_dist"))
        .filter(F.col("jaccard_dist") <= max_jaccard_distance)
    )


# --- Connected components (near-dup clusters) -------------------------------


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Group near-dup PAIRS into dedup CLUSTERS: connected components by
    iterative min-label propagation. Each node starts labeled with its own
    id; every round each node takes the min label over itself and its
    neighbors; fixpoint = every node labeled with the min id reachable in
    its component.

    ``edges`` is (id_a, id_b) undirected (extra columns ignored); isolated
    nodes keep their own id as the component. Output: (id_col, component).

    Scale design: the (usually expensive) candidate-pair plan behind
    ``edges`` is materialized ONCE via ``localCheckpoint`` — without it,
    lazy evaluation re-runs that whole plan every round. The label loop
    runs only over nodes that appear in some edge (isolated nodes can
    never change label; they are stitched back at the end with their own
    id), so per-round cost is one shuffle-join + one groupBy over O(|E|),
    not O(|V|); rounds = graph diameter, which for near-dup graphs is
    tiny (clusters are dense cliques-ish, diameter ~2-4).
    ``localCheckpoint`` also truncates the growing lineage each round so
    plan size stays constant; the only driver-side value per round is the
    1-row convergence count. The loop is control flow, not data flow —
    the per-round work is fully distributed (this is GraphFrames' CC
    shape without the dependency).

    ``checkpoint_dir``: when set, per-round materialization uses RELIABLE
    checkpoints (``sparkContext.setCheckpointDir`` + ``df.checkpoint``)
    instead of ``localCheckpoint`` — on a real cluster a localCheckpoint
    lives in executor block storage and an executor loss mid-loop kills
    the lineage-truncated frame; reliable checkpoints survive it at the
    cost of a distributed-FS write per round. Local mode keeps the
    (faster) default.

    Raises ``RuntimeError`` if the label propagation has not converged
    after ``max_iter`` rounds of TWO hops each (possible only on a
    path-graph of length > 2·max_iter — near-dup graphs have tiny
    diameter): unconverged labels would silently split components.

    Driver-action budget (r3 — r2's loop ran TWO blocking actions per
    single-hop round and regressed the bench 2.3×): each round folds TWO
    propagation hops into one materialization, and the convergence count
    IS the materializing action (lazy checkpoint + full-scan count of
    changed labels — one job computes every partition, persists it, and
    returns the count). Per-round wall time is logged at INFO on
    ``featurestore_for_joycastle_java_spark.operators.dedup`` so a future
    regression is attributable to a specific round, not the whole query."""
    import logging
    import time

    log = logging.getLogger(__name__)
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            # reliable checkpoints have no lazy variant worth the extra
            # read; eager-write then count is still one FS materialization
            return df.checkpoint(eager=True)

    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=False)

    half = edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # sym must honor checkpoint_dir: every round re-reads it, so a
    # locally-checkpointed sym would void the executor-loss guarantee the
    # reliable per-round checkpoints provide. EAGER in both modes — round
    # 1 consumes sym from three stages (comp-distinct + both hops), and a
    # lazy checkpoint would let concurrent stages each recompute the
    # (expensive) candidate-pair plan behind it.
    # hash-partition the edge list on src BEFORE checkpointing it: the
    # checkpoint captures the partitioning, so every round's
    # sym⋈labels(src==node) join reuses it instead of re-exchanging the
    # (biggest) edge side each round — labels come out of the previous
    # round's groupBy(node) already hash-partitioned on the same key.
    # One up-front shuffle of |E| buys diameter-many avoided ones.
    sym_plan = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition(F.col("src"))
    sym = (
        sym_plan.checkpoint(eager=True)
        if checkpoint_dir is not None
        else sym_plan.localCheckpoint(eager=False)
    )
    # The count() IS the eager materialization (it computes and persists
    # every partition of the lazy local checkpoint — one action, not
    # checkpoint-then-scan), and the edge count it returns makes
    # cross-round bench deltas attributable (fixture density vs code —
    # r3's CC "regression" was confounded by a denser regenerated
    # fixture). Reliable-checkpoint mode keeps the eager FS write; its
    # count is a cheap scan of the checkpointed files.
    # The count IS the eager materialization, and the edge count it logs
    # makes cross-round bench deltas attributable (fixture density vs
    # code). A small-graph fast path that pinned AQE off + 8 shuffle
    # partitions for the loop was measured here and dropped: round times
    # are dominated by per-round plan compilation, not task count, so it
    # bought nothing and mutated session-global config.
    n_edges = sym.count() // 2
    log.info("connected_components edges=%d (undirected)", n_edges)
    # initial labels need NO checkpoint of their own: depth-1 lineage off
    # the checkpointed edges (r2 spent a blocking action materializing it)
    comp = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    label_type = dict(comp.dtypes)["comp"]

    def hop(labels: DataFrame, carried: list[str]) -> DataFrame:
        """One min-label hop. ``carried`` columns of ``labels`` (snapshots
        of earlier labels) ride through the agg on the row tagged
        own=True, so convergence needs no extra join."""
        nbr = sym.join(labels, sym.src == labels.node).select(
            F.col("dst").alias("node"),
            "comp",
            F.lit(False).alias("own"),
            *[F.lit(None).cast(label_type).alias(c) for c in carried],
        )
        own = labels.withColumn("own", F.lit(True))
        return (
            own.unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("comp").alias("comp"),
                *[F.min(F.when(F.col("own"), F.col(c))).alias(c) for c in carried],
            )
        )

    def shortcut(labels: DataFrame, carried: list[str]) -> DataFrame:
        """Label compression (pointer doubling): comp ← label[comp].
        Every comp value is itself a labeled node (labels start as own
        ids and only ever take mins over node ids), so the lookup is a
        self-join on comp = node; labels only decrease, preserving the
        monotonicity the convergence proof rests on. Turns O(diameter)
        plain-hop rounds into O(log diameter): a chain a-b-c-d-e settles
        in one hop+shortcut+hop round instead of three hop-hop rounds."""
        m = labels.select(F.col("node").alias("__k"), F.col("comp").alias("__v"))
        return labels.join(m, labels.comp == m.__k, "left").select(
            "node",
            F.coalesce("__v", "comp").alias("comp"),
            *carried,
        )

    converged = False
    for rnd in range(max_iter):
        t0 = time.monotonic()
        # hop → shortcut → hop per materialized round, snapshotting only
        # the label BEFORE the final hop (__mid). One aggregation action
        # materializes the checkpoint AND returns the final hop's change
        # count — and a zero-change FULL HOP is itself the fixpoint proof
        # (min-label over every neighborhood moved nothing), so dense
        # graphs that settle mid-round never pay a separate confirmation
        # round. The shortcut between the hops compresses label chains
        # (reach ~2^r, not 2r), cutting the round count — and each round
        # saved is a saved checkpoint + count action, the per-round fixed
        # cost that dominates on small graphs. The pre-round snapshot was
        # measured and dropped: carrying it through both hops cost more
        # than the logging it bought.
        h1 = shortcut(hop(comp, []), [])
        h2 = hop(h1.withColumn("__mid", F.col("comp")), ["__mid"])
        new_full = ckpt(h2)
        chg2 = F.sum((F.col("comp") != F.col("__mid")).cast("int"))
        row = new_full.agg(
            F.coalesce(chg2, F.lit(0)).alias("chg2"),  # empty graph → 0
        ).first()
        comp = new_full.select("node", "comp")
        log.info(
            "connected_components round %d: hop2_changed=%d %.3fs",
            rnd, row["chg2"], time.monotonic() - t0,
        )
        if row["chg2"] == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (graph diameter exceeds it)"
        )
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("comp", F.col("node")).alias("component"),
        )
    )
