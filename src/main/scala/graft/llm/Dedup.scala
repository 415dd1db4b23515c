package graft.llm

import graft.functions.TextHashOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, in increasing fuzziness:
 * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
 * (embedding-based pairs live in [[Similarity]]).
 *
 * Scale design (100 TB):
 * - Signatures (MinHash, SimHash) are computed per-row by native codegen
 *   expressions ([[TextHashOps]]) — a narrow map over the corpus, NO shuffle,
 *   no per-token explode.
 * - Candidate generation (LSH bands / SimHash chunks / shared shingles) bounds
 *   the pair space before any exact verification join; joins are
 *   hash-partitioned on high-cardinality hash keys so skew is bounded and AQE
 *   can split hot buckets.
 * - A document-frequency cap drops ubiquitous features so inverted-index
 *   self-joins cannot go quadratic on stop-features.
 */
object Dedup {

  /** Exact dedup: hash-groupBy on content, keep lowest id as canonical. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Rows surviving exact dedup (canonical representatives only). */
  def exactSurvivors(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val canon = exact(docs, idCol, textCol).select(col("canonical_id").as(idCol))
    docs.join(canon, idCol)
  }

  /** Word n-gram shingles (n consecutive tokens joined by space), distinct per doc. */
  def shingles(text: Column, n: Int): Column =
    TextHashOps.textNgrams(text, n)

  /** Default similarity feature: word 3-gram shingle set. */
  def shingleSet(textCol: Column): Column = shingles(textCol, 3)

  /**
   * Exact Jaccard over SORTED-DISTINCT hashed feature arrays (the form
   * [[minhashSignatures]] emits): `|A∩B|` from one two-pointer merge, and
   * `|A∪B| = |A|+|B|-|A∩B|` — value-identical to the old
   * `array_intersect`/`array_union` formulation (both are set-semantics
   * over the same hashes) with zero per-pair hash-set allocation, which
   * profiled as the single largest stage of the minhash mining pipeline.
   */
  private def mergeJaccard(a: Column, b: Column): Column = {
    val nc = TextHashOps.sortedIntersectCount(a, b).cast("double")
    nc / (size(a) + size(b) - nc)
  }

  /**
   * Exact-Jaccard verification of an EXPLICIT candidate pair list, with the
   * verifier shape chosen by the (driver-known) candidate count:
   *
   *  - `pairs.count() <= smallCap` (the normal case when an estimator
   *    already decided all but a sliver): per-pair `array_intersect`/
   *    `array_union` over shingle sets computed ONLY for the pair docs via
   *    a broadcast semi-join. Interpreted set ops, but on a bounded list
   *    they beat the posting join's 6-stage fixed cost — that machinery
   *    billed ~1 s to verify SEVEN pairs in dedup_streaming_parity.
   *  - above `smallCap`: the posting-join count shape (the
   *    [[jaccardPairs]]/minedPairCounts pattern) — |pairs|·avg_shingles
   *    rows through codegen'd equi-joins, map-side-combined counts, no
   *    broadcast of an unbounded id list.
   *
   * Both shapes compute J over the same hashed shingle sets — identical
   * output by construction (spec-pinned by forcing each branch on one
   * fixture). Caller supplies `pairs` as (id_a, id_b); output keeps only
   * pairs with exact J ≥ threshold. NOTE: `pairs` is counted — hand in a
   * materialized (checkpointed/persisted) frame, or its lineage runs twice.
   *
   * Input pairs are CANONICALIZED here — (least, greatest), distinct —
   * before either branch: a duplicated or both-orientations pair would
   * double `nc` in the posting-join branch (sa/sb don't double → wrong J)
   * while the small branch would just emit duplicates; canonicalizing makes
   * the branches agree for ANY input. Output ids keep the canonical
   * orientation (id_a < id_b). threshold ≤ 0 short-circuits to the
   * canonical pair list itself (J ≥ 0 always holds, including zero-overlap
   * pairs the posting join would silently drop).
   *
   * BEHAVIOR NOTE (r14, intentional): explicit `features` arrays are now
   * `sortedDistinct`-hashed on BOTH branches, so duplicate-containing
   * feature arrays get SET semantics everywhere. Before r14 the posting
   * branch counted duplicates (multiset J) while the small branch did not —
   * callers who tuned thresholds against the old large-path multiset
   * numbers will see slightly higher J for dup-heavy features now.
   */
  def verifyPairsExact(docs: DataFrame, pairs: DataFrame, threshold: Double,
                       smallCap: Long = 8192L, idCol: String = "doc_id",
                       features: Column = null): DataFrame = {
    // no checkpoint: `pairs` is materialized by contract, so re-running
    // the canonical projection per consumer is one tiny shuffle — an
    // eager checkpoint here billed ~2 task-CPU-s of pure job overhead to
    // dedup_streaming_parity (r13 A/B) to save re-shuffles of ~200 rows
    val canon = pairs
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    if (threshold <= 0.0) return canon
    // same fused-vs-composable split as minhashSignatures
    val hashedFeat =
      if (features == null) TextHashOps.textNgramsXxh64Sorted(col("text"), 3)
      else TextHashOps.sortedDistinct(TextHashOps.xxhash64Array(features))
    val ids = canon.select(col("id_a").as("id"))
      .unionByName(canon.select(col("id_b").as("id"))).distinct()
    if (canon.count() <= smallCap) {
      val pfeats = docs
        .join(broadcast(ids), docs(idCol) === ids("id"), "left_semi")
        .select(col(idCol).as("id"), hashedFeat.as("feats"))
        .localCheckpoint(true) // <= 2·|pairs| rows; scan docs once
      val fa = pfeats.select(col("id").as("id_a"), col("feats").as("_fa"))
      val fb = pfeats.select(col("id").as("id_b"), col("feats").as("_fb"))
      canon.join(broadcast(fa), "id_a").join(broadcast(fb), "id_b")
        .filter(mergeJaccard(col("_fa"), col("_fb")) >= threshold)
        .select("id_a", "id_b")
    } else {
      val posts = docs
        .join(ids, docs(idCol) === ids("id"), "left_semi")
        .select(col(idCol).as("id"), explode(hashedFeat).as("h"))
        .localCheckpoint(true) // read 3× (sizes + both join sides)
      val sizes = posts.groupBy("id").agg(count(lit(1)).as("sz"))
      canon
        .join(posts.select(col("id").as("id_a"), col("h")), "id_a")
        .join(posts.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("nc"))
        .join(sizes.select(col("id").as("id_a"), col("sz").as("sa")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("sz").as("sb")), "id_b")
        .filter(col("nc").cast("double") /
          (col("sa") + col("sb") - col("nc")).cast("double") >= threshold)
        .select("id_a", "id_b")
    }
  }

  /**
   * N-gram Jaccard near-dup pairs ≥ threshold via inverted-index self-join on
   * shared features (the PPJoin/Vernica-et-al count-then-filter shape).
   *
   * Shape: shingles are hashed to 64-bit longs per posting row (narrow
   * shuffle, primitive join keys — NEVER per-pair array ops, which cost
   * O(|A|·|B|) interpreted string compares per candidate and were measured
   * at ~6300 CPU-s for 1.1M candidates at sf0.1). The per-pair common count
   * `nc` falls out of the posting self-join as a `groupBy(id_a,id_b).count`,
   * and `J = nc / (|A|+|B|-nc)` — one exchange, all codegen.
   *
   * Scale guard `maxDf`: a feature shared by d docs contributes d² rows to
   * the self-join, so one stop-shingle makes it quadratic in corpus size.
   * With a cap, candidate generation uses only features with df ≤ cap; the
   * prune bound stays EXACT by also counting each doc's over-cap ("hot")
   * features: true_nc ≤ nc_capped + min(hot_a, hot_b), so any pair the
   * bound keeps has its true count recomputed from the full posting lists
   * (restricted to survivors — bounded work), and emitted scores are
   * cap-independent. Pairs whose ENTIRE intersection is hot (the capped
   * join emits no row for them — the boilerplate-in-boilerplate case) are
   * recovered through the hot-dominated-doc path (see [[minedPairCounts]]),
   * so the capped result equals the uncapped result for both metrics.
   * API default is None (complete recall); pass a cap explicitly at scale.
   *
   * 64-bit feature hashing is score-exact up to xxhash64 collisions
   * (expected collisions ≈ F²/2⁶⁵ for F distinct features — ~3 total at
   * F=10¹⁰, each perturbing one pair's count by 1).
   */
  def jaccardPairs(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      features: Column = null,
      maxDf: Option[Long] = None): DataFrame = {
    val t = threshold
    val jac = col("nc").cast("double") /
      (col("sa") + col("sb") - col("nc")).cast("double")
    // exact-safe prune bound for J ≥ t: J ≥ t ⟺ nc·(1+t) ≥ t·(|A|+|B|)
    // hot-dominated bound: for a hot-only pair, nc·(1+t) ≥ t·(sa+sb) with
    // sb ≥ nc gives nc ≥ t·sa, and nc ≤ hot_a — so hot ≥ t·sz on BOTH sides
    minedPairCounts(docs, idCol, features, maxDf,
      (ncU, sa, sb) => ncU.cast("double") * (1.0 + t) >= lit(t) * (sa + sb) - 1e-9,
      (hot, sz) => hot.cast("double") >= lit(t) * sz - 1e-9,
      scored => scored.filter(jac >= t)
        .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard")))
  }

  /**
   * N-gram CONTAINMENT pairs: C(A,B) = |A∩B| / min(|A|,|B|) ≥ threshold —
   * the subset-duplicate metric Jaccard misses (a short doc embedded
   * verbatim in a much longer one has high containment but low Jaccard;
   * the standard C4/RefinedWeb-style decontamination check). Same
   * inverted-index posting-join scale shape as [[jaccardPairs]], same
   * exact-safe `maxDf` stop-feature guard with the containment-specific
   * prune bound: C ≥ t ⟺ nc ≥ t·min(|A|,|B|), and
   * true_nc ≤ nc_capped + min(hot_a, hot_b).
   */
  def containmentPairs(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      features: Column = null,
      maxDf: Option[Long] = None): DataFrame = {
    val t = threshold
    val cont = col("nc").cast("double") / least(col("sa"), col("sb")).cast("double")
    // hot-dominated bound: a hot-only pair has nc ≥ t·min(sa,sb) and
    // nc ≤ hot_min — so the MIN-size side satisfies hot ≥ t·sz
    minedPairCounts(docs, idCol, features, maxDf,
      (ncU, sa, sb) => ncU.cast("double") >= lit(t) * least(sa, sb) - 1e-9,
      (hot, sz) => hot.cast("double") >= lit(t) * sz - 1e-9,
      scored => scored.filter(cont >= t)
        .select(col("id_a"), col("id_b"), round(cont, 4).as("containment")))
  }

  /**
   * Shared pair-mining core for the n-gram set-similarity family:
   * inverted-index posting self-join → per-pair common counts `nc` with
   * both set sizes (`sa`, `sb`) attached. `pruneKeep(ncUpper, sa, sb)` is
   * the metric's exact-safe survivor bound under the `maxDf` stop-feature
   * cap, where `ncUpper = nc_capped + min(hot_a, hot_b)` upper-bounds the
   * true common count (so pruning can never drop a qualifying pair; the
   * survivors' true counts are recomputed from the full posting lists).
   *
   * Hot-only recovery: a qualifying pair can hide ENTIRELY inside the
   * stop-feature set (every shared shingle has df > cap) — the capped
   * self-join then produces NO row for it, and no prune bound can save a
   * pair that never becomes a candidate. But such a pair's min-size side
   * must be HOT-DOMINATED — `hotOnlyKeep(hot, sz)` is the metric's
   * necessary per-doc condition (hot ≥ t·sz for both Jaccard and
   * containment) — and hot-dominated docs are few (a doc made almost
   * entirely of boilerplate). Candidates for those docs are re-mined from
   * the HOT posting lists with one side restricted to the dominated set;
   * the join is output-bounded: a boilerplate doc genuinely contained in
   * many docs has a proportionally large TRUE pair set, so the recovery
   * work scales with real answers, not with corpus size. Recovered
   * candidates enter the same prune + exact-recount pipeline (ncc = 0,
   * bound = min(hot_a, hot_b)), keeping capped == uncapped exact.
   *
   * Returns (id_a, id_b, nc, sa, sb) with id_a < id_b; caller applies the
   * final score + threshold and cuts lineage.
   */
  private def minedPairCounts(
      docs: DataFrame,
      idCol: String,
      features: Column,
      maxDf: Option[Long],
      pruneKeep: (Column, Column, Column) => Column,
      hotOnlyKeep: (Column, Column) => Column,
      finish: DataFrame => DataFrame): DataFrame = {
    // Two rules learned from the physical plan:
    // 1. repartition first — single-file inputs scan as ONE task;
    // 2. materialize before exploding — otherwise projection-collapse
    //    inlines the (interpreted) feature expression above the Generate
    //    and re-evaluates it per exploded row.
    val hashedFeat =
      if (features == null) TextHashOps.textNgramsXxh64Sorted(col("text"), 3)
      else TextHashOps.sortedDistinct(TextHashOps.xxhash64Array(features))
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val posts = docs.repartition(par)
      // hash INSIDE the fused array expression before exploding: the
      // Generate emits primitive longs instead of shingle strings (smaller
      // generator rows, no per-posting hash call); same seed-42 xxh64
      .select(col(idCol).as("id"), hashedFeat.as("feats"))
      .repartition(par, col("id")) // materialization barrier
      .select(col("id"), explode(col("feats")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = posts.groupBy("id").agg(count(lit(1)).as("sz"))
    def sz(side: String, as: String) =
      sizes.select(col("id").as(side), col("sz").as(as))
    def pairCounts(p: DataFrame, cnt: String) =
      p.select(col("id").as("id_a"), col("h"))
        .join(p.select(col("id").as("id_b"), col("h")), "h")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as(cnt))
    var hotCache: Option[DataFrame] = None
    var hotPostsCache: Option[DataFrame] = None
    var survCache: Option[DataFrame] = None
    val scored = maxDf match {
      case None =>
        pairCounts(posts, "nc").join(sz("id_a", "sa"), "id_a").join(sz("id_b", "sb"), "id_b")
      case Some(cap) =>
        // The stop-feature ("hot", df > cap) set is SMALL by construction:
        // |hot| ≤ total_postings / cap (each hot feature owns > cap posting
        // rows), and in text corpora it's vocabulary-bounded boilerplate.
        // So materialize ONLY the hot keys and broadcast them: `capped`
        // becomes a narrow anti-join over the cached postings instead of a
        // full posting-table shuffle against the df table — which mattered
        // doubly because the self-join below evaluates `capped` twice.
        // (If cap is ever set so low that hot outgrows the broadcast limit,
        // raise cap proportionally with corpus size — the guard's purpose
        // is stop-features, and df>cap rows per feature keep |hot| ≤ P/cap.)
        val hotFeats = posts.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("h")
          .persist(StorageLevel.MEMORY_AND_DISK)
        hotCache = Some(hotFeats)
        // Driver-side gate, level 0: with NO hot features the cap is
        // inactive and the ENTIRE capped pipeline is identity overhead —
        // capped == posts, every prune bound is ncc + 0, and the survivor
        // recount recomputes counts that are already exact. Run the
        // uncapped shape instead (one self-join, no prune, no recount).
        // The probe populates the persisted hotFeats either way.
        if (hotFeats.isEmpty) {
          pairCounts(posts, "nc")
            .join(sz("id_a", "sa"), "id_a").join(sz("id_b", "sb"), "id_b")
        } else {
        val capped = posts.join(broadcast(hotFeats), Seq("h"), "left_anti")
        // hot postings read three times (hot counts, dominated-side
        // restriction, recovery join) — cache once, release at the end
        val hotPosts = posts.join(broadcast(hotFeats), Seq("h"), "left_semi")
          .persist(StorageLevel.MEMORY_AND_DISK)
        hotPostsCache = Some(hotPosts)
        val hot = hotPosts.groupBy("id").agg(count(lit(1)).as("hot"))
        def hc(side: String, as: String) =
          hot.select(col("id").as(side), col("hot").as(as))
        // hot-only recovery (scaladoc above): candidates whose every
        // shared feature is hot never appear in the capped self-join —
        // re-mine them from the hot postings with one side restricted to
        // the (few) hot-dominated docs. Empty dominated set ⇒ near-free.
        val domIds = hot.join(sizes, "id")
          .filter(hotOnlyKeep(col("hot"), col("sz"))).select("id")
        // Driver-side gate (the zero-row-repair-subtree rule): with NO
        // hot-dominated docs — the common case on non-degenerate corpora —
        // the recovery join would stream the hot postings and, worse, the
        // union would re-shuffle EVERY capped candidate pair through a
        // second groupBy just to max() against zero rows. The probe costs
        // one aggregation pass over the cached postings.
        val anyDominated = !domIds.isEmpty
        val allCands = if (!anyDominated) pairCounts(capped, "ncc") else {
          val domPosts = hotPosts.join(broadcast(domIds), Seq("id"), "left_semi")
          val recovered = domPosts.select(col("id").as("id_x"), col("h"))
            .join(hotPosts.select(col("id").as("id_y"), col("h")), "h")
            .filter(col("id_x") =!= col("id_y"))
            .select(least(col("id_x"), col("id_y")).as("id_a"),
              greatest(col("id_x"), col("id_y")).as("id_b"))
            .dropDuplicates("id_a", "id_b")
            .withColumn("ncc", lit(0L))
          // union BEFORE the prune: a pair present in both keeps its real
          // capped count (max of ncc and the recovery sentinel 0)
          pairCounts(capped, "ncc").unionByName(recovered)
            .groupBy("id_a", "id_b").agg(max("ncc").as("ncc"))
        }
        // exact-safe prune via the metric's own bound (pruneKeep), with
        // true_nc ≤ ncc + min(hot_a, hot_b) as the upper bound
        // persisted: survivors are read three times below (survIds, the
        // trueNc probe join, and the final score join) — without the cache
        // each consumer re-runs the whole pairCounts self-join pipeline
        val surv = allCands
          .join(sz("id_a", "sa"), "id_a").join(sz("id_b", "sb"), "id_b")
          .join(hc("id_a", "hot_a"), Seq("id_a"), "left")
          .join(hc("id_b", "hot_b"), Seq("id_b"), "left")
          .na.fill(0L, Seq("hot_a", "hot_b"))
          .filter(pruneKeep(col("ncc") + least(col("hot_a"), col("hot_b")),
            col("sa"), col("sb")))
          .select("id_a", "id_b", "sa", "sb")
          .persist(StorageLevel.MEMORY_AND_DISK)
        // true common counts for survivors only (|surv| × |feats_a| bounded);
        // restrict the posting table to survivor ids FIRST (broadcast
        // semi-join — survivor count is pair-bounded) so the (id_b, h)
        // equi-join shuffles only survivor postings, not the whole corpus
        val survIds = surv.select(col("id_a").as("id"))
          .union(surv.select(col("id_b").as("id"))).distinct()
        val survPosts = posts.join(broadcast(survIds), Seq("id"), "left_semi")
        val trueNc = surv.select("id_a", "id_b")
          .join(survPosts.select(col("id").as("id_a"), col("h")), "id_a")
          .join(survPosts.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("nc"))
        survCache = Some(surv)
        surv.join(trueNc, Seq("id_a", "id_b"))
        }
    }
    // Materialize the (small) finished result with a hard lineage cut, then
    // release the multi-referenced intermediates. Unpersisting
    // lazily-returned frames would silently disable the caches mid-plan;
    // unpersisting nothing leaks executor storage into every later query in
    // the session (measured: dedup_exact regressed 5.7× under the leaked
    // blocks). The metric's filter/select runs INSIDE the cut (before
    // unpersist) so the threshold prunes before materialization.
    val result = finish(scored).localCheckpoint(true)
    posts.unpersist(false)
    hotCache.foreach(_.unpersist(false))
    hotPostsCache.foreach(_.unpersist(false))
    survCache.foreach(_.unpersist(false))
    result
  }

  /**
   * MinHash signatures via the fused native expression — one narrow pass,
   * no shuffle. Output: (id, feats array<long> of HASHED features, sig
   * array<long> of k mins).
   *
   * `feats` carries the 64-bit xxhash64 of each feature, not the raw
   * shingle strings: every downstream consumer (the exact-Jaccard
   * verification joins) operates on the hashed sets, and emitting them
   * here means each doc is hashed exactly ONCE — the signature expression
   * and the feats column share the same hashing subexpression inside one
   * Project (whole-stage codegen CSE), where re-hashing at the verify
   * joins cost 2 extra full passes over the corpus (r13: +30 task-CPU-s
   * at x10 where docs outnumber candidate pairs). Long arrays also halve
   * the exchange bytes vs shingle strings. J over hashed sets is
   * score-exact up to xxhash64 collisions ([[jaccardPairs]] argument).
   */
  def minhashSignatures(docs: DataFrame, k: Int, idCol: String = "doc_id",
                        features: Column = null): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // default path: the fused byte-level shingle+hash expression (zero
    // string allocation — the tokenize/substring/StringBuilder chain was
    // the dominant data-sized term of the whole minhash family); explicit
    // feature columns take the composable hash+sort chain. Both emit the
    // SORTED-DISTINCT form so every downstream exact-J verification counts
    // intersections with a two-pointer merge (no per-pair hash sets).
    val hashed =
      if (features == null) TextHashOps.textNgramsXxh64Sorted(col("text"), 3)
      else TextHashOps.sortedDistinct(TextHashOps.xxhash64Array(features))
    // one spread exchange of the RAW docs, signature computed narrow after
    // it; every caller persists the result immediately, and that persist is
    // the materialization barrier that stops projection-collapse from
    // inlining (and re-evaluating) `hashed` into downstream band
    // expressions. The previous trailing repartition(par, id) was a second
    // FULL exchange of (id, feats, sig) — a whole-corpus shuffle of the
    // widest frame in the pipeline — bought nothing: banded derivations
    // re-exchange on (band, band_hash) anyway and the feats verify joins
    // broadcast the candidate side (r15 measurement: removing it is part of
    // the survivors ×10 177→65 task-CPU drop).
    docs.repartition(par)
      .select(col(idCol).as("id"),
        hashed.as("feats"),
        TextHashOps.minhashSignature(hashed, k).as("sig"))
  }

  /**
   * MinHash LSH candidate pairs: band the k-wide signature into `bands`
   * groups of k/bands rows, hash each band, bucket-join on (band, hash).
   * With k=64, bands=32 (r=2): P(candidate | J=0.5) ≈ 0.9999, random pairs
   * essentially never collide.
   *
   * `feats_a`/`feats_b` carry the 64-BIT HASHED feature sets (one
   * xxhash64 pass per doc), not the raw shingle strings: downstream exact
   * verification does per-pair `array_intersect`/`array_union`, and set
   * ops over longs beat interpreted string hashing/compares ~5-10× while
   * J stays score-exact up to xxhash64 collisions (the [[jaccardPairs]]
   * hashing argument — ≈F²/2⁶⁵ expected collisions).
   */
  def minhashCandidates(docs: DataFrame, k: Int, bands: Int,
                        idCol: String = "doc_id", features: Column = null): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
    // checkpointed: the banding branch and both feature re-joins read `sig`;
    // without materialization each branch re-computes the whole signature
    // pipeline. Released before return — see jaccardPairs' leak note.
    val sig = minhashSignatures(docs, k, idCol, features)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // band join carries ids only (narrow shuffle); features re-join after dedup
    val banded = sig.select(
      col("id"),
      posexplode(TextHashOps.bandHashes(col("sig"), bands))
        .as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val cands = a.join(b, Seq("band", "band_hash")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val feats = sig.select(col("id"), col("feats")) // already hashed (see minhashSignatures)
    val result = cands
      .join(feats.select(col("id").as("id_a"), col("feats").as("feats_a")), "id_a")
      .join(feats.select(col("id").as("id_b"), col("feats").as("feats_b")), "id_b")
      .localCheckpoint(true)
    sig.unpersist(false)
    result
  }

  /**
   * CROSS-corpus near-dup pairs (decontamination shape): every left
   * ("train") doc whose Jaccard with ANY right ("benchmark") doc clears
   * the threshold. Unlike the self-join family this joins BETWEEN two
   * sets — banded MinHash buckets on both sides, candidates from the
   * (band, hash) equi-join, exact-Jaccard verification on the candidate
   * pairs only. At 100 TB the benchmark side is typically small (eval
   * suites): its banded buckets broadcast, and the train corpus streams
   * through map-side — one pass, no train-side self-join ever exists.
   * Output: (id_a = left id, id_b = right id, jaccard), score-exact.
   */
  def crossMinhashPairs(left: DataFrame, right: DataFrame, threshold: Double,
                        k: Int = 64, bands: Int = 32,
                        idCol: String = "doc_id", features: Column = null): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
    def banded(docs: DataFrame, side: String): (DataFrame, DataFrame) = {
      val sig = minhashSignatures(docs, k, idCol, features)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val b = sig.select(
        col("id").as(s"id_$side"),
        posexplode(TextHashOps.bandHashes(col("sig"), bands))
          .as(Seq("band", "band_hash")))
      (b, sig)
    }
    val (ba, sigA) = banded(left, "a")
    val (bb, sigB) = banded(right, "b")
    // benchmark buckets broadcast (eval suites are small by construction);
    // Spark falls back to shuffle automatically if the side outgrows the
    // broadcast threshold — the plan shape stays correct either way
    val cands = ba.join(broadcast(bb), Seq("band", "band_hash"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val jac = mergeJaccard(col("feats_a"), col("feats_b"))
    val result = cands
      .join(sigA.select(col("id").as("id_a"), col("feats").as("feats_a")), "id_a")
      .join(sigB.select(col("id").as("id_b"), col("feats").as("feats_b")), "id_b")
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
      .localCheckpoint(true)
    sigA.unpersist(false)
    sigB.unpersist(false)
    result
  }

  /** LSH candidates verified with exact Jaccard ≥ threshold. */
  def minhashPairs(docs: DataFrame, threshold: Double, k: Int = 64, bands: Int = 32,
                   idCol: String = "doc_id", features: Column = null): DataFrame = {
    minhashCandidates(docs, k, bands, idCol, features)
      .withColumn("jaccard", mergeJaccard(col("feats_a"), col("feats_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /**
   * SPANNING-edge LSH candidates for connected-component consumers
   * ([[clusters]] / [[clusterSurvivors]] — the common 100 TB path): per
   * (band, bucket), every member links to the bucket's MIN id (a star) —
   * Θ(d) edges for a d-member bucket instead of the banded self-join's
   * full Θ(d²) clique. The candidate graph's connected components are
   * IDENTICAL (every clique is connected by its star), so downstream CC
   * can't tell the difference, while pair mining on a dup-heavy corpus
   * (the case LSH buckets exist for) drops from quadratic to linear.
   *
   * Shape: bucket-min is a plain groupBy (one shuffle on the bucket key);
   * the hub-edge join streams the banded rows once — no self-join, no
   * per-bucket materialization, skew-safe (a degenerate bucket emits d
   * rows, not d²). Output: (id_a = hub, id_b, feats_a, feats_b), same
   * contract as [[minhashCandidates]].
   */
  def minhashSpanningCandidates(docs: DataFrame, k: Int, bands: Int,
                                idCol: String = "doc_id", features: Column = null): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
    val sig = minhashSignatures(docs, k, idCol, features)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sig.select(
      col("id"),
      posexplode(TextHashOps.bandHashes(col("sig"), bands))
        .as(Seq("band", "band_hash")))
    // window-min hub edges: one exchange, no banded⋈hubs join (see
    // [[minhashSpanningPairs]] for the measured argument)
    val cands = banded
      .withColumn("id_a",
        min(col("id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "band_hash")))
      .filter(col("id") =!= col("id_a"))
      .select(col("id_a"), col("id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val feats = sig.select(col("id"), col("feats")) // already hashed
    val result = cands
      .join(feats.select(col("id").as("id_a"), col("feats").as("feats_a")), "id_a")
      .join(feats.select(col("id").as("id_b"), col("feats").as("feats_b")), "id_b")
      .localCheckpoint(true)
    sig.unpersist(false)
    result
  }

  /**
   * Spanning-edge LSH candidates verified with exact Jaccard ≥ threshold,
   * with intra-bucket FALLBACK verification on failed hub edges — the
   * linear-output pair source for [[clusters]]/[[clusterSurvivors]].
   *
   * Hub-edge-only verification relies on in-bucket near-dup transitivity:
   * a bucket {H, B, C} with J(H,B) < t, J(H,C) < t but J(B,C) ≥ t would
   * lose the B—C edge and split a cluster the clique miner finds (the r11
   * ADVICE divergence scenario). The fallback closes it exactly: members
   * whose hub edge FAILS are re-verified against every other member of that
   * bucket, so for any in-bucket pair (X,Y) with J ≥ t either both hub
   * edges pass (X—hub—Y path) or the failing side emits the X—Y edge
   * directly — connected components equal the verified-clique graph's BY
   * CONSTRUCTION, no transitivity assumption. Every emitted edge is an
   * exactly-verified ≥-t pair. Fallback candidates whose endpoints are both
   * already pass-connected to a common node are pruned before verification
   * (they cannot change CC). Dup-heavy buckets (LSH's raison d'être)
   * verify ~d hub edges and rarely fall back → Θ(d); a degenerate bucket of
   * mutual strangers degrades to the Θ(d²) the clique miner always pays.
   */
  def minhashSpanningPairs(docs: DataFrame, threshold: Double, k: Int = 64, bands: Int = 32,
                           idCol: String = "doc_id", features: Column = null,
                           pruneGate: Long = 65536L): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val sig = minhashSignatures(docs, k, idCol, features)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // fused band hashing (one signature walk, no 32 slice copies per row);
    // `banded` is a cheap NARROW derivation off the sig cache — consumers
    // that need it twice recompute it rather than persist 32n tiny rows
    // (r14: caching an exploded frame cost more than narrow recomputes)
    def banded = sig.select(
      col("id"),
      posexplode(TextHashOps.bandHashes(col("sig"), bands))
        .as(Seq("band", "band_hash")))
    // Exact-Jaccard verification of an explicit CANDIDATE LIST stays in
    // the per-pair array_intersect shape on purpose: the posting-count
    // alternative (minedPairCounts' shape) wins when the posting join IS
    // the candidate generator, but verifying a given pair list that way
    // costs |cands|×avg_shingles intermediate rows through 6 shuffled
    // joins — measured 7.5 s vs 4.0 s for dedup_clusters at sf0.1 when
    // this function briefly switched. ~tens of thousands of interpreted
    // set-ops are cheaper than the join fan-out.
    val featsA = sig.select(col("id").as("id_a"), col("feats").as("feats_a"))
    val featsB = sig.select(col("id").as("id_b"), col("feats").as("feats_b"))
    def verified(cands: DataFrame): DataFrame = // (id_a, id_b) -> + exact J
      cands.join(featsA, "id_a").join(featsB, "id_b")
        .select(col("id_a"), col("id_b"),
          mergeJaccard(col("feats_a"), col("feats_b")).as("jaccard"))

    // hub edges WITH bucket provenance (needed to scope the fallback) via a
    // whole-partition window min: ONE exchange of the 32n banded rows. The
    // previous groupBy+join shape paid that exchange TWICE (partial-agg
    // exchange for the bucket mins, then the banded⋈hubs join) — measured
    // 25-30% dearer at ×10 — and is skew-equivalent (a degenerate bucket
    // stays d rows here, never a collected d-array). Persisted: read by the
    // verification pass AND the fallback's failed-member scoping.
    val hubEdges = banded
      .withColumn("id_a",
        min(col("id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "band_hash")))
      .filter(col("id") =!= col("id_a"))
      .select(col("band"), col("band_hash"), col("id_a"), col("id").as("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hubVerdicts = verified(hubEdges.select("id_a", "id_b").dropDuplicates())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hubPass = hubVerdicts.filter(col("jaccard") >= threshold)

    // Driver-side gate: the fallback subtree (4 joins + a distinct) exists
    // only to repair FAILED hub edges. On a corpus where every hub edge
    // verifies (the common dup-heavy case), probing the persisted verdicts
    // once (populating the cache hubPass reads anyway) skips those stages
    // outright instead of scheduling them to produce zero rows.
    val failedCount = hubVerdicts.filter(col("jaccard") < threshold).count()
    val combined = if (failedCount == 0L) hubPass else {
      // members whose hub edge failed, in each bucket where it failed
      val failedMembers = hubEdges
        .join(hubVerdicts.filter(col("jaccard") < threshold), Seq("id_a", "id_b"))
        .select(col("band"), col("band_hash"), col("id_b").as("fid"))
      val fallbackCandsRaw = failedMembers
        .join(banded, Seq("band", "band_hash"))
        .filter(col("id") =!= col("fid"))
        .select(least(col("fid"), col("id")).as("id_a"),
          greatest(col("fid"), col("id")).as("id_b"))
        .dropDuplicates("id_a", "id_b")
        // hub edges (pass or fail) are already decided — don't re-verify
        .join(hubVerdicts.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
      // PASS-SET PRUNE (r12 verdict #6), gated by the failed-edge count
      // (free off the persisted verdicts): a fallback pair whose endpoints
      // BOTH carry a passing verified edge to the same node z is already
      // in one component through z — the direct edge adds nothing to CC
      // (the only consumer contract), so its verification can be skipped.
      // The prune costs a checkpoint + two adjacency joins, so it engages
      // only when the fallback volume is large enough for the saved
      // verifications to dominate (dup-heavy buckets at scale); below the
      // gate the r12 shape — verify everything — is strictly cheaper
      // (r13 A/B: the ungated prune billed +4 task-CPU-s to
      // dedup_semantic at sf0.1 to save sub-second verification; r15:
      // with merge-based verification a fallback pair costs ~50 µs to
      // verify, so at the ×10 probe's 19k failures the prune's fixed
      // cost lost to direct verification in an interleaved fresh-JVM A/B
      // — gate raised 4096 → 65536; above it the checkpoint+joins still
      // guard the degenerate-bucket blowup a 100 TB corpus can hit).
      val fallbackPass = if (failedCount <= pruneGate) {
        verified(fallbackCandsRaw).filter(col("jaccard") >= threshold)
      } else {
        val fallbackCands = fallbackCandsRaw
          .localCheckpoint(true) // read by the prune AND the anti below
        val adj = hubPass.select(col("id_a").as("_z"), col("id_b").as("_m"))
          .unionByName(hubPass.select(col("id_b").as("_z"), col("id_a").as("_m")))
        val prunable = fallbackCands
          .join(adj.select(col("_z"), col("_m").as("id_a")), Seq("id_a"))
          .join(adj.select(col("_z"), col("_m").as("id_b")), Seq("id_b", "_z"))
          .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
        verified(fallbackCands.join(prunable, Seq("id_a", "id_b"), "left_anti"))
          .filter(col("jaccard") >= threshold)
      }
      hubPass.unionByName(fallbackPass).dropDuplicates("id_a", "id_b")
    }
    val result = combined
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .localCheckpoint(true)
    sig.unpersist(false)
    hubEdges.unpersist(false)
    hubVerdicts.unpersist(false)
    result
  }

  /**
   * Connected components over near-dup pairs → cluster ids, via iterative
   * min-label propagation with POINTER JUMPING: every node starts labeled
   * with itself; each round every node takes the min of its own and its
   * neighbors' labels, then twice composes the result through the previous
   * round's label map (label(v) ← min(label(v), prevLabel(label(v)))), so
   * covered distance ~triples per round and convergence takes O(log
   * diameter) rounds instead of diameter-many. That matters beyond worst
   * case: near-clique dup groups converge in 2-3 rounds either way, but
   * low-threshold similarity graphs CHAIN (the banded cosine graph at
   * t=0.30 is near-path-shaped at sf0.1 — 17 rounds plain, 10 jumped).
   *
   * The fixpoint LOOP runs on pair RDDs, not DataFrames — the deliberate,
   * measured exception to the DataFrame-first rule (PLANS.md): Catalyst +
   * AQE re-plan the full logical tree per round per stage, which billed
   * 0.25-1.6 s of pure DRIVER planning per round at sf0.1 (growing with
   * join depth, to minutes when the round plan was unrolled deeper) — a
   * constant that data size cannot amortize and that dwarfs the actual
   * sub-second data work of a round at bench scale. The RDD loop runs the
   * identical dataflow with zero per-round planning. Scale shape: the edge
   * list is hash-partitioned ONCE by source endpoint and reused narrow
   * every round; per-round shuffles carry only the node-sized label table
   * (map-side-combined neighbor mins + the two jump compositions), never
   * the edge list. Every round's labels are localCheckpoint'd (hard
   * lineage cut — on a fault-tolerant cluster swap for checkpoint();
   * persist-only lineage chains re-executed the whole mining pipeline per
   * round when a cache block evicted: measured 1296 vs ~60 CPU-s at sf0.1).
   *
   * Node ids must be INTEGRAL — enforced with a hard error (a string/UUID
   * id would silently null under the long cast). Labels only ever decrease
   * toward reachable ids, so the fixed point — no improvement anywhere in a
   * round — is the component-min labeling.
   *
   * Edge endpoints need not be a subset of `docs`: the node universe is
   * docs ∪ endpoints, connectivity flows THROUGH non-doc endpoints, and
   * `cluster_id` is the min reachable node id (doc or not) — but output
   * rows are emitted for `docs` only. Both paths implement this same
   * contract (the driver union-find naturally; the RDD loop by seeding
   * labels with the endpoint set and filtering the result to doc nodes),
   * so results don't depend on which side of `smallGraphEdgeCap` ran.
   *
   * Graphs at or under `smallGraphEdgeCap` edges skip the loop entirely:
   * the materialized edge list is union-found on the driver and the label
   * map broadcast-joined back onto `docs` — same component-min labeling,
   * one narrow stage instead of rounds × stages (spec-pinned equal to the
   * distributed path).
   *
   * Output: (doc_id, cluster_id) for EVERY doc in `docs`; `cluster_id` is
   * the minimum doc id reachable through the pair graph — so the canonical
   * survivor of each cluster is exactly the row where doc_id == cluster_id.
   */
  def clusters(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
               maxIterations: Int = 50,
               smallGraphEdgeCap: Long = 524288L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    def requireIntegral(df: DataFrame, c: String, what: String): Unit = {
      val dt = df.schema(c).dataType
      require(integral.contains(dt),
        s"clusters: $what column '$c' must be integral, got $dt — a string/UUID id would silently null under the long cast")
    }
    requireIntegral(docs, idCol, "docs id")
    requireIntegral(pairs, "id_a", "pairs")
    requireIntegral(pairs, "id_b", "pairs")
    // both orientations keyed by (src → dst's labels flow to src); built
    // from ONE pass over `pairs` (whose upstream is the whole pair-mining
    // pipeline), partitioned once, reused narrow in every round
    val edgesRaw = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .distinct()
    edgesRaw.localCheckpoint()
    val edgeCount = edgesRaw.count() // materialize; hard-cuts mining lineage
    // SMALL-GRAPH fast path: a VERIFIED near-dup edge list is usually tiny
    // relative to the corpus (dedup's whole premise), and the iterative
    // loop's floor is rounds × stages of task launches — 0.7 s at bench
    // scale for a 246-edge graph. Under the cap (≤ 512k edges ⇒ ≤ 8 MB of
    // longs, broadcast-dim territory), union-find the edge list on the
    // driver and label docs with ONE broadcast join: cluster_id = min id
    // of the component, identical to the loop's min-label fixpoint. The
    // bound is the already-materialized edge COUNT, not a guess — a
    // dup-heavy 100 TB corpus whose edge list outgrows it takes the
    // distributed pointer-jumping loop below.
    if (edgeCount <= smallGraphEdgeCap) {
      val parent = new java.util.HashMap[Long, java.lang.Long]()
      def find(x: Long): Long = {
        var r = x
        while ({ val p = parent.get(r); p != null && p.longValue() != r }) r = parent.get(r)
        var c = x // path compression
        while ({ val p = parent.get(c); p != null && p.longValue() != c }) {
          val nxt = parent.get(c).longValue(); parent.put(c, r); c = nxt
        }
        r
      }
      edgesRaw.collect().foreach { case (a, b) =>
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val relabeled = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      parent.keySet().forEach { id =>
        val r = find(id)
        if (r != id) relabeled += ((id, r)) // singletons label themselves via coalesce
      }
      val lm = spark.createDataset(relabeled.toSeq).toDF(idCol, "_cc_label")
      return docs.select(col(idCol).cast("long").as(idCol))
        .join(broadcast(lm), Seq(idCol), "left")
        .select(col(idCol), coalesce(col("_cc_label"), col(idCol)).as("cluster_id"))
    }
    // RIGHT-SIZED parallelism: the per-round cost floor is task launches
    // (stages × partitions), and AQE's post-shuffle coalescing does not
    // apply to RDD stages — a 32-way partitioner on a 1k-edge graph billed
    // ~0.5 s/round of pure task scheduling (≈190 sub-KB tasks). Partition
    // count scales with the edge list (~20k edges/partition), capped at the
    // cluster's parallelism, so bench-scale graphs run 1-2 wide while a
    // 100 TB edge list still fans out fully.
    val part = new HashPartitioner(math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, edgeCount / 20000L + 1L)).toInt)
    val edges = edgesRaw.partitionBy(part)
    edges.localCheckpoint()
    edges.count()
    // node universe = docs ∪ edge endpoints (scaladoc contract): labels
    // must propagate THROUGH endpoints absent from docs, matching the
    // driver union-find path. Doc nodes are kept for the final filter.
    val docNodes = docs.select(col(idCol).cast("long"))
      .as[Long].rdd.map(v => (v, v)).partitionBy(part)
    docNodes.localCheckpoint()
    var labels: RDD[(Long, Long)] = docNodes
      .union(edgesRaw.keys.map(v => (v, v)))
      .reduceByKey(part, (a: Long, _: Long) => a)
    labels.localCheckpoint()
    val nNodes = labels.count()
    var converged = nNodes == 0L
    var iter = 0
    while (!converged && iter < maxIterations) {
      val prev = labels
      // neighbor min: edges(src,dst) ⋈ labels(dst) — NARROW (both sides
      // hash-partitioned by key) — then map-side-combined min per src
      val nmin = edges.join(prev)
        .map { case (_, (src, dstLabel)) => (src, dstLabel) }
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      val stepped = prev.leftOuterJoin(nmin) // narrow: both on `part`
        .mapValues { case (l, m) => (math.min(l, m.getOrElse(l)), l) }
      // one pointer jump through prev; (id,(label,origLabel)) keyed by label
      // (a second jump composition measured ZERO round-count benefit on the
      // real sf0.1 similarity graphs — distance growth saturates — so one
      // jump keeps the shuffle count minimal while still collapsing
      // pathological chains: a 256-path converges in 8 rounds, not 255)
      val jumped = stepped
        .map { case (id, (lab, prevL)) => (lab, (id, prevL)) }
        .leftOuterJoin(prev)
        .map { case (lab, ((id, prevL), ll)) =>
          (id, (math.min(lab, ll.getOrElse(lab)), prevL))
        }
      val changedAcc = spark.sparkContext.longAccumulator
      val next = jumped
        .partitionBy(part)
        .mapValues { case (lab, prevL) => // mapValues PRESERVES partitioning
          if (lab < prevL) changedAcc.add(1L)
          lab
        }
      next.localCheckpoint()
      next.count() // materialize; accumulator now holds the change count
      // (task retries can only over-count → at worst one extra round)
      converged = changedAcc.value == 0L
      labels = next
      iter += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[dedup] clusters converged in $iter rounds")
    // emit doc rows only (narrow: both sides on `part`); endpoint-only
    // nodes carried labels for connectivity but are not output rows
    docNodes.join(labels).map { case (id, (_, lab)) => (id, lab) }
      .toDF(idCol, "cluster_id")
  }

  /** Canonical survivors: one representative row per near-dup cluster. */
  def clusterSurvivors(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(clusters(docs, pairs, idCol).filter(col(idCol) === col("cluster_id"))
      .select(idCol), idCol)

  /** Default token-array hash: fused xxhash64 (fastest; Spark-only). */
  val xxhashTokens: Column => Column = TextHashOps.xxhash64Array

  /**
   * md5-based 60-bit token-array hash — bit-reproducible in any engine with
   * md5 (the DuckDB oracle uses `('0x' || substr(md5(t),1,15))::BIGINT`).
   * 60 bits so the value is always a positive Long. Fused loop, value-equal
   * to `transform(arr, t => conv(substring(md5(t),1,15),16,10))`.
   */
  val md5Tokens: Column => Column = TextHashOps.md5Hash60Array

  /**
   * SimHash 64-bit fingerprints via the fused native expressions — narrow
   * map, no shuffle, no interpreted HOFs. Token-level (unigram) hashing;
   * `tokenHasher` maps the distinct-token ARRAY to an array of hashes.
   */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              tokenHasher: Column => Column = xxhashTokens): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // one spread exchange of the raw docs; the fingerprint compute is
    // narrow after it and [[simhashPairs]] persists the result — the
    // persist is the materialization barrier (the old trailing
    // repartition(par, id) was a second full exchange bought for nothing,
    // same finding as minhashSignatures r15)
    docs.repartition(par).select(col(idCol).as("id"),
      TextHashOps.simhash64(
        tokenHasher(TextHashOps.textNgrams(col(textCol), 1))).as("simhash"))
  }

  /**
   * SimHash near-dup pairs with Hamming distance ≤ maxDist via the block
   * trick: split 64 bits into `maxDist+1` chunks — any pair within distance
   * must share one exact chunk (pigeonhole). Join on (chunk, value), verify
   * with bit_count(xor).
   */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3, idCol: String = "doc_id",
                   textCol: String = "text",
                   tokenHasher: Column => Column = xxhashTokens): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val fp = simhash(docs, idCol, textCol, tokenHasher).persist(StorageLevel.MEMORY_AND_DISK)
    val banded = fp.select(
      col("id"), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("simhash"), c * width).bitwiseAND((1L << width) - 1)
      }: _*)).as(Seq("chunk", "chunk_val")))
    val a = banded.select(col("chunk"), col("chunk_val"), col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = banded.select(col("chunk"), col("chunk_val"), col("id").as("id_b"), col("simhash").as("fp_b"))
    val result = a.join(b, Seq("chunk", "chunk_val")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .localCheckpoint(true)
    fp.unpersist(false)
    result
  }
}
