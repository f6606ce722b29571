package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Similarity search over the `embeddings` table (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline (exact,
  * oracle-checked); the LSH-bucketed and IVF variants are the scale
  * paths — at 100 TB the brute-force inner loop only ever runs inside
  * a bucket/posting-list, never across the full corpus.
  *
  * Cross-engine float discipline: dot products are computed in exact
  * decimal (order-independent ⇒ partition-order-proof), then divided
  * in IEEE double with the same expression shape as the oracle SQL —
  * so cosines, and therefore rankings, match DuckDB bit-for-bit.
  */
object Similarity {

  // Inputs at DECIMAL(12,9): both engines round the float identically;
  // products land at scale 18 exactly. The accumulator is pinned to
  // DECIMAL(30,18) with an explicit cast — Spark's decimal `+` widens
  // precision by one per step (and past 38 would silently drop scale,
  // losing exactness); the cast keeps the fold type-stable and is
  // value-exact since |dot| << 10^12.
  private val dec = DecimalType(12, 9)
  private val accType = DecimalType(30, 18)

  /** Exact decimal dot product of two float-array columns. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      // float→double→decimal: Spark's float→decimal cast rounds the
      // FLOAT's shortest string repr ("0.15469436"), DuckDB rounds the
      // binary value — widening to double first makes both engines
      // round the same 17-digit value
      zip_with(a, b, (x, y) =>
        x.cast(DoubleType).cast(dec) * y.cast(DoubleType).cast(dec)),
      lit(java.math.BigDecimal.ZERO).cast(accType),
      (acc, x) => (acc + x).cast(accType))

  /** Euclidean norm via the exact self-dot, finished in double. */
  def norm(v: Column): Column = sqrt(dotExact(v, v).cast(DoubleType))

  /** Exact decimal squared-L2 distance of two float-array columns —
    * the [[dotExact]] discipline on differences (diffs exact at
    * DECIMAL(13,9), squares at scale 18, accumulator pinned). Shared
    * by the PQ encoder (q80) and the ADC search (q83). */
  private[queries] def sqDistExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType).cast(dec) - y.cast(DoubleType).cast(dec)
        d * d
      }),
      lit(java.math.BigDecimal.ZERO).cast(accType),
      (acc, x) => (acc + x).cast(accType))

  /** Flag every vector of `batch` against the standing `corpus` index
    * (both in (vec_id, cell, q6, nrm) layout — the persisted IVF
    * artifact): cell occupancy as candidate count, verified near-dup
    * at fixed-point cosine ≥ `threshold`, smallest matching corpus
    * vec_id as the canonical target. ONE definition shared by the
    * batch [[q103DeltaEmbedDedup]] and the streaming ingest filter
    * ([[graft.streaming.StreamingEmbedDedup]]) — the embedding twin of
    * [[Dedup.flagAgainstIndex]]'s batch≡stream guarantee.
    *
    * Scale shape: the corpus side is the index the pipeline already
    * maintains (assignment + 8-byte-per-dim codes, no raw floats);
    * per ingest the join touches |batch| × cell occupancy — never
    * corpus × corpus, and never a re-cluster of the standing index. */
  private[graft] def flagAgainstCells(batch: DataFrame, corpus: DataFrame,
      threshold: Double): DataFrame = {
    import graft.functions.VectorOps._
    val occ = corpus.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_candidates"))
    val verified = batch.as("d").join(corpus.as("c"), col("d.cell") === col("c.cell"))
      .withColumn("cosine",
        cosineQ(dot_long(col("d.q6"), col("c.q6")), col("d.nrm"), col("c.nrm")))
      .filter(col("cosine") >= threshold)
      .groupBy(col("d.vec_id").as("vec_id"))
      .agg(min(col("c.vec_id")).as("dup_of"))
    batch.select(col("vec_id"), col("cell"))
      .join(occ, Seq("cell"), "left")
      .join(verified, Seq("vec_id"), "left")
      .na.fill(0L, Seq("n_candidates"))
      .select(col("vec_id"), col("cell"), col("n_candidates"),
        col("dup_of").isNotNull.cast("long").as("is_dup"), col("dup_of"))
  }

  // --------------------------------------------------------------- q103
  /** Incremental (delta) SEMANTIC dedup — q76's ingest pattern applied
    * to embeddings, completing the delta triple (q76 text LSH, q97
    * entities, q103 embeddings): an incoming batch of vectors is
    * checked against the standing corpus WITHOUT re-pairing the corpus
    * against itself. The "batch" is the ~10% of vectors whose
    * md5-uniform key falls below 0.1 (the q76 stand-in for "today's
    * embeddings"); the rest is the standing corpus. Blocking is the
    * frozen coarse-quantizer artifact ([[q51IvfAssign]]'s codebook) —
    * batch vectors are assigned with the SAME argmax kernel, then
    * compared only against corpus vectors in their cell at the q102
    * threshold. In scope: batch-vs-corpus only — two NEW vectors
    * duplicating each other are within-batch dedup's job (q102).
    *
    * Scale shape: per ingest, assignment is map-side (broadcast
    * codebook), and the verify join costs |batch| × cell occupancy —
    * the IVF ingest path a production vector store runs. The shared
    * assignment⋈codes table is localCheckpoint'd (delta and corpus
    * sides both read it). */
  def q103DeltaEmbedDedup(spark: SparkSession, dir: String): DataFrame = {
    val v = ivfIndex(spark, dir)
      .withColumn("_delta", TextOps.uniformKeyOf(col("vec_id")) < lit(0.1))
    flagAgainstCells(v.filter(col("_delta")).drop("_delta"),
        v.filter(!col("_delta")).drop("_delta"), threshold = 0.35)
      .orderBy(col("vec_id"))
  }

  // --------------------------------------------------------------- q21
  /** Brute-force cosine top-5 for query vectors vec_id < 10.
    * Queries are broadcast (tiny side), candidates stream — a single
    * narrow pass over the corpus + a bounded top-k. Vectors are
    * quantized ONCE per row by the native [[graft.functions.VectorOps]]
    * kernels; every pair dot is then an exact fixed-point long loop in
    * codegen — same values as the decimal-SQL oracle, ~20× cheaper
    * than a decimal lambda per pair. */
  def q21KnnBrute(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps._
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("q6", vector_quantize(col("embedding")))
      .withColumn("nrm", normQ(dot_long(col("q6"), col("q6"))))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q6").as("qq6"),
        col("nrm").as("qn"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      col("q6").as("cq6"), col("nrm").as("cn"))
    val cos = cosineQ(dot_long(col("qq6"), col("cq6")), col("qn"), col("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      // report at 9 decimals: the fixed-point→double finish can differ
      // by one ulp across engines (ranking is unaffected — cosine gaps
      // between distinct random vectors are ≫ 1 ulp)
      .withColumn("cosine", round(col("cosine"), 9))
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  // --------------------------------------------------------------- q22
  /** Random-hyperplane LSH bucketing (Charikar): `planes` sign bits,
    * each the sign of a dot with a deterministic ±1 Rademacher vector
    * (splitmix64-derived), computed by the native [[graft.functions
    * .LshBucket64]] kernel over the quantized vector — one long-loop
    * pass per row. Output is the per-doc bucket assignment + bucket
    * occupancy — the blocking structure an ANN query probes.
    * Oracle-checked: the splitmix64 sign table and fixed-point dot are
    * reproduced in DuckDB SQL (see `oracle`), plus planted-duplicate
    * tests. */
  def q22LshBuckets(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps._
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("bucket", lsh_bucket(vector_quantize(col("embedding"))))
    val occupancy = emb.groupBy("bucket").agg(count(lit(1)).as("n_bucket_mates"))
    emb.join(occupancy, "bucket")
      .select("vec_id", "bucket", "n_bucket_mates")
      .orderBy("vec_id")
  }

  // --------------------------------------------------------------- q23
  /** IVF-style ANN: coarse quantizer = UNSUPERVISED spherical k-means
    * ([[graft.operators.CoarseQuantizer]] — deterministic
    * farthest-point init + fixed Lloyd iterations, trained on a
    * bounded vec_id-ordered sample, the faiss practice; no labels
    * consulted, so the pipeline works on a real unlabeled corpus),
    * vectors assigned to nearest centroid, queries probe the top-2
    * centroid cells and run exact cosine only inside them.
    * Rows-only check; recall vs q21 is asserted in SimilaritySpec. */
  /** Fast double dot for internal (non-oracle) paths: sequential fold,
    * deterministic within Spark, ~3× cheaper than the decimal fold. */
  def dotDouble(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def q23IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps._
    // quantize + norm ONCE per side — recomputing inside the pair
    // expression would redo the self-dot for every (vector, centroid)
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("q6", vector_quantize(col("embedding")))
      .withColumn("nrm", normQ(dot_long(col("q6"), col("q6"))))
    // centroids: k-means on a BOUNDED deterministic sample (lowest
    // vec_ids — TakeOrdered, no full sort). The collect is capped at
    // maxSample × dim doubles regardless of corpus size; the full
    // corpus only ever sees the broadcast assignment join below.
    val maxSample = 4096
    val sampled = emb.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(maxSample)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val k = 10
    val cents = graft.operators.CoarseQuantizer.train(sampled, k, iters = 10)
    import spark.implicits._
    val centroids = cents.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.map(_.toFloat)) }
      .toDF("c_label", "centroid")
      .withColumn("c6", vector_quantize(col("centroid")))
      .withColumn("cnrm", normQ(dot_long(col("c6"), col("c6"))))
      .select("c_label", "c6", "cnrm")
    val cB = broadcast(centroids)

    def cosPair(v6: Column, vn: Column, c6: Column, cn: Column): Column =
      cosineQ(dot_long(v6, c6), vn, cn)

    // assignment: argmax cosine over centroids as ONE map-side
    // expression over the k-row codebook — no explode, no shuffle,
    // no aggregate (the earlier crossJoin + max(struct) form shuffled
    // every (vector, centroid) pair and SortAggregate'd the struct
    // max). Tie-break: highest label (ties are measure-zero for real
    // vectors; determinism is what matters).
    val cRows = centroids.collect() // k rows by construction
    val cb = graft.functions.CentroidCodebook(
      cRows.map(_.getLong(0)),
      cRows.map(_.getSeq[Long](1).toArray),
      cRows.map(_.getDouble(2)))
    val assigned = emb.select(col("vec_id"), col("q6"), col("nrm"))
      .withColumn("cell",
        argmax_cosine(col("q6"), col("nrm"), cb).getField("c_label"))

    // queries probe top-2 cells
    val probes = emb.filter(col("vec_id") < 10).crossJoin(cB)
      .withColumn("sim", cosPair(col("q6"), col("nrm"), col("c6"), col("cnrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("c_label"))))
      .filter(col("rn") <= 2)
      .select(col("vec_id").as("query_id"), col("q6").as("qq6"),
        col("nrm").as("qn"), col("c_label").as("cell"))

    val cand = probes.join(assigned, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        cosPair(col("qq6"), col("qn"), col("q6"), col("nrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
    cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // --------------------------------------------------------------- q51
  /** The IVF ASSIGNMENT stage isolated for cross-engine verification
    * (VERDICT r5 #6): q23's end-to-end ANN stays rows-only because the
    * trained centroids aren't SQL-expressible, but the assignment
    * kernel — argmax fixed-point cosine over a centroid table — is.
    * Here the centroid table is deterministic IN SQL (the k lowest
    * vec_id vectors), so DuckDB can rebuild it and hash-check every
    * cell assignment. Same kernel, same quantization, same argmax
    * tie-break as q23's trained path.
    *
    * Scale shape is q23's: the k-row codebook rides inside a single
    * map-side [[graft.functions.ArgmaxCosine]] expression — the corpus
    * streams once with NO explode, NO shuffle, and NO aggregate for
    * the assignment (the earlier crossJoin + max(struct) form
    * shuffled every (vector, centroid) pair and planned the struct
    * max as a SortAggregate). The codebook collect is k rows by
    * construction. */
  /** (vec_id, …, q6, nrm) quantized-code projection — the columns the
    * similarity family ships instead of raw float arrays. */
  private[graft] def quantizedCodes(df: DataFrame): DataFrame = {
    import graft.functions.VectorOps._
    df.withColumn("q6", vector_quantize(col("embedding")))
      .withColumn("nrm", normQ(dot_long(col("q6"), col("q6"))))
  }

  /** The frozen coarse-quantizer artifact: the k lowest-vec_id vectors
    * of `embRaw`, collected (k rows by construction) into the literal
    * codebook the argmax kernel broadcasts. ONE derivation shared by
    * q51/q102/q103 and the streaming ingest seam. */
  private[graft] def frozenCodebook(embRaw: DataFrame, k: Int = 10)
      : graft.functions.CentroidCodebook = {
    val centRows = quantizedCodes(embRaw).filter(col("vec_id") < k)
      .select(col("vec_id"), col("q6"), col("nrm"))
      .orderBy("vec_id").collect()
    graft.functions.CentroidCodebook(
      centRows.map(_.getLong(0)),
      centRows.map(_.getSeq[Long](1).toArray),
      centRows.map(_.getDouble(2)))
  }

  /** Cell assignment + codes for any embedding frame under a frozen
    * codebook — map-side only (the codebook rides inside the single
    * [[graft.functions.ArgmaxCosine]] expression; no join, no shuffle,
    * no explode). */
  private[graft] def assignCells(embRaw: DataFrame,
      cb: graft.functions.CentroidCodebook): DataFrame = {
    import graft.functions.VectorOps._
    quantizedCodes(embRaw)
      .select(col("vec_id"),
        argmax_cosine(col("q6"), col("nrm"), cb).as("best"),
        col("q6"), col("nrm"))
      .select(col("vec_id"), col("best.c_label").as("cell"),
        col("q6"), col("nrm"))
  }

  def q51IvfAssign(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps._
    val emb = Tables(spark, dir, "embeddings")
    val cb = frozenCodebook(emb)
    quantizedCodes(emb).select(col("vec_id"),
        argmax_cosine(col("q6"), col("nrm"), cb).as("best"))
      .select(col("vec_id"), col("best.c_label").as("cell"),
        round(col("best.sim"), 9).as("cosine"))
      .orderBy("vec_id")
  }

  private[graft] val ivfBase: String =
    sys.env.getOrElse("SPARK_GRAFT_IVF_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/") +
        "/graft-ivfindex")

  /** The IVF assignment + quantized-code table (vec_id, cell, q6, nrm)
    * as a PERSISTED parquet artifact — the index a production vector
    * store maintains: assign once, then every cell-health check
    * (q68/q82), semantic dedup pass (q102), and delta ingest (q103)
    * reads the narrow code table instead of re-running the argmax over
    * the float corpus. Same [[graft.sources.ArtifactStore]]
    * content-address contract as the LSH signature index and PQ codes:
    * keyed by the embeddings files' metadata fingerprint, so staleness
    * is impossible and the deterministic builder makes a republish
    * value-identical — oracles are unaffected. */
  /** Bucket count for the bucketed IVF artifact — folded into the
    * artifact address (layout change = new artifact). */
  private[graft] val IvfBuckets = 16

  private[graft] def ivfIndex(spark: SparkSession, dir: String): DataFrame = {
    val key = graft.Tables.fileFingerprint(spark, s"$dir/embeddings.parquet")
    // bucketed on cell: the SemDeDup within-cell self-join (q102) is
    // the Σ cell² pass — with the layout declared, BOTH self-join
    // sides read co-located and the pairwise stage runs with no
    // exchange at all; cell-grouped consumers (q82 imbalance) get the
    // same for free
    graft.sources.ArtifactStore.readOrPublishBucketed(
      spark, s"$ivfBase/cell-b$IvfBuckets-$key", "cell", IvfBuckets)(
      assignCells(Tables(spark, dir, "embeddings"),
        frozenCodebook(Tables(spark, dir, "embeddings"))))
  }

  // --------------------------------------------------------------- q115
  /** Incremental maintenance of the IVF index — the THIRD artifact
    * family from the r13 verdict's rebuild-from-scratch finding, and
    * the one whose semantics differ: centroids come from training, so
    * exact "incremental k-means" doesn't exist. The production vector-
    * store pattern is assign-under-frozen-centroids: `index(v) =
    * append(index(v−1), assign(delta, centroids))` with the centroids
    * PINNED at the chain's origin — new vectors are assigned under the
    * existing codebook each ingest, and retraining is an explicit full
    * rebuild (the fallback branch here). The codebook needs no side
    * channel: the index rows carry (q6, nrm), so the k centroid rows
    * ride IN the previous artifact ([[codebookFromIndex]]) — the
    * frozen-codebook discipline is self-enforcing, an artifact chain
    * can never silently drift centroids between versions.
    *
    * Cost per version: one map-side argmax pass over DELTA vectors
    * (the k-row codebook lives inside the expression — no join, no
    * shuffle) plus the artifact rewrite; the embeddings table is
    * never re-assigned. The oracle replays the whole contract from
    * scratch: codebook = the standing split's vec_id<10 vectors,
    * assignment of EVERY vector under it — hash equality proves the
    * append path lands exactly where one global assignment would. */
  def q115IncrIvfIndex(spark: SparkSession, dir: String): DataFrame = {
    val base = versionedVectors(spark, dir)
    ivfIndexAt(spark, base, 1L) // v1 first: origin of the frozen chain
    ivfIndexAt(spark, base, 2L)
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id"))
  }

  /** Scratch versioned embeddings lake (q115's fixture): v1 = standing
    * (1−0.1) split by the md5-uniform vec_id key — the SAME split
    * q103's delta ingest uses — v2 = full, each with its
    * `embeddings_delta` change table. Same idempotence/claim
    * discipline as the documents lake. */
  private[graft] def versionedVectors(spark: SparkSession, dir: String)
      : String = {
    import graft.sources.Versioned
    val key = graft.Tables.fileFingerprint(spark, s"$dir/embeddings.parquet")
    val base = s"$ivfBase/lake-$key"
    val all = Tables(spark, dir, "embeddings")
    val fresh = TextOps.uniformKeyOf(col("vec_id")) < lit(0.1)
    if (Versioned.currentVersion(spark, base).isEmpty)
      Versioned.publish(spark, base, Seq(
        Versioned.TableSpec("embeddings", all.filter(!fresh)),
        Versioned.TableSpec("embeddings_delta", all.filter(!fresh))))
    if (Versioned.currentVersion(spark, base).contains(1L))
      Versioned.publish(spark, base, Seq(
        Versioned.TableSpec("embeddings", all),
        Versioned.TableSpec("embeddings_delta", all.filter(fresh))))
    base
  }

  // --------------------------------------------------------------- q132
  /** ANN SERVED from the maintained IVF index — the vector sibling of
    * q128's grain-served BM25, and the first ORACLE-CHECKED end-to-end
    * ANN query (q23 is rows-only because its k-means centroids are not
    * SQL-expressible; the CHAIN's codebook is the standing split's
    * k-lowest-vec_id vectors, which is): queries probe their top-2
    * centroid cells under the chain-frozen codebook (read from the v1
    * origin artifact — the v2 artifact's own vec_id<k rows may include
    * delta vectors the freeze never saw) and run exact fixed-point
    * cosine ONLY against the probed cells' code rows. Hash equality
    * against a full DuckDB replay (assignment CTE + decimal pair
    * cosine + rank) proves cells, candidates, cosines, and ranking all
    * match cross-engine.
    *
    * Scale shape: centroids and the (query × probed-cell) table
    * broadcast; the index streams through ONE hash join on `cell`; per
    * query the exact-cosine work is Σ probed-cell occupancy, never
    * |corpus| — the IVF serving economics, now hash-verifiable. */
  def q132IvfServe(spark: SparkSession, dir: String, topK: Int = 5,
      probeCells: Int = 2): DataFrame = {
    val base = versionedVectors(spark, dir)
    val origin = ivfIndexAt(spark, base, 1L) // the frozen codebook rows
    val idx = ivfIndexAt(spark, base, 2L)
    val queries = idx.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("q6").as("qq6"),
        col("nrm").as("qn"))
    ivfServe(origin, idx, queries, topK, probeCells)
  }

  /** Probe + score under the chain-frozen codebook: the shared back
    * half of [[q132IvfServe]] (registry queries) and [[searchKnn]]
    * (ad-hoc vectors, `GET /knn`). `queries` carries (query_id, qq6,
    * qn); a query_id no corpus vector uses (e.g. −1) disables the
    * self-exclusion for external vectors. */
  private[graft] def ivfServe(origin: DataFrame, idx: DataFrame,
      queries: DataFrame, topK: Int, probeCells: Int): DataFrame = {
    import graft.functions.VectorOps._
    val cents = origin.filter(col("vec_id") < 10)
      .select(col("vec_id").as("c_label"), col("q6").as("c6"),
        col("nrm").as("cn"))
    // top-N cells per query: tiny cross (|queries| × ≤k centroids),
    // rank window over bounded per-query groups; tie-break c_label
    // DESC — the argmax kernel's highest-label convention, replayed
    // verbatim in the oracle's assignment CTE
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("sim",
        cosineQ(dot_long(col("qq6"), col("c6")), col("qn"), col("cn")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("c_label").desc)))
      .filter(col("rn") <= probeCells)
      .select(col("query_id"), col("qq6"), col("qn"),
        col("c_label").as("cell"))
    val cand = idx.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineQ(dot_long(col("qq6"), col("q6")), col("qn"), col("nrm")))
    cand.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= topK)
      .withColumn("cosine", round(col("cosine"), 9))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Ad-hoc ANN search: a USER-SUPPLIED vector scored against the
    * maintained IVF index at the embeddings lake's current version —
    * the vector face of [[TextOps.searchBm25]], and `GET /knn`'s
    * engine. The query rides as query_id −1 (no corpus vector uses
    * it), so an external vector is never self-excluded. */
  def searchKnn(spark: SparkSession, dir: String, qvec: Array[Float],
      topK: Int = 5, probeCells: Int = 2): DataFrame = {
    import graft.sources.Versioned
    import graft.functions.VectorOps._
    import spark.implicits._
    val base = versionedVectors(spark, dir)
    val v = Versioned.currentVersion(spark, base)
      .getOrElse(sys.error(s"no published embeddings version under $base"))
    val origin = ivfIndexAt(spark, base, 1L)
    val idx = ivfIndexAt(spark, base, v)
    // dimension guard: the fixed-point dot kernel truncates to the
    // shorter array, so a wrong-width vector would return confidently
    // wrong rankings instead of an error — check against the index's
    // own quantized width (one ≤k-row probe) and refuse loudly
    val dim = origin.filter(col("vec_id") < 10)
      .select(size(col("q6"))).head.getInt(0)
    require(qvec.length == dim,
      s"query vector has ${qvec.length} components; the index is " +
        s"$dim-dimensional")
    val queries = Seq(Tuple1(qvec.toSeq)).toDF("embedding")
      .withColumn("q6", vector_quantize(col("embedding")))
      .withColumn("nrm", normQ(dot_long(col("q6"), col("q6"))))
      .select(lit(-1L).as("query_id"), col("q6").as("qq6"),
        col("nrm").as("qn"))
    ivfServe(origin, idx, queries, topK, probeCells)
  }

  private[graft] def ivfIndexArtifact(lakeBase: String, v: Long): String =
    s"$lakeBase-idx-v$v"

  /** The k-row codebook reconstructed from an index artifact's own
    * rows — centroids are wherever the chain froze them. */
  private[graft] def codebookFromIndex(idx: DataFrame, k: Int = 10)
      : graft.functions.CentroidCodebook = {
    val rows = idx.filter(col("vec_id") < k)
      .select(col("vec_id"), col("q6"), col("nrm"))
      .orderBy("vec_id").collect() // ≤ k rows by construction
    graft.functions.CentroidCodebook(
      rows.map(_.getLong(0)),
      rows.map(_.getSeq[Long](1).toArray),
      rows.map(_.getDouble(2)))
  }

  /** The IVF code table of the lake's embeddings AT version `v`,
    * maintained by frozen-centroid append ([[q115IncrIvfIndex]]). */
  private[graft] def ivfIndexAt(spark: SparkSession, lakeBase: String,
      v: Long): DataFrame =
    graft.sources.ArtifactStore.readOrPublish(
      spark, ivfIndexArtifact(lakeBase, v))(
      incrementalIvfFrame(spark, lakeBase, v))

  /** Maintenance frame behind [[ivfIndexAt]]: previous artifact +
    * change table present ⇒ assign the delta under the codebook
    * carried by the previous artifact and append; otherwise full
    * (re)build — which is also how a RETRAIN is expressed. */
  private[graft] def incrementalIvfFrame(spark: SparkSession,
      lakeBase: String, v: Long): DataFrame = {
    import graft.sources.{ArtifactStore, Versioned}
    val hasDelta = Versioned.tableExists(spark, lakeBase, "embeddings_delta", v)
    val hasRemoved =
      Versioned.tableExists(spark, lakeBase, "embeddings_removed", v)
    ArtifactStore.readIfPresent(spark, ivfIndexArtifact(lakeBase, v - 1))
      match {
        case Some(prev) if hasDelta || hasRemoved =>
          // vec-keyed rows ⇒ tombstoned removal is an exact anti-join
          // (the q126 grain-chain discipline); a removed CENTROID
          // vector only loses its data row — the chain's geometry
          // lives in the frozen codebook reconstruction, which reads
          // vec_id < k from the kept rows, so removing centroid rows
          // forces the loud fallback on the NEXT maintenance rather
          // than silent drift (codebookFromIndex returns fewer rows)
          val kept = if (hasRemoved)
            prev.join(
              Versioned.readAt(spark, lakeBase, "embeddings_removed", v)
                .select(col("vec_id")), Seq("vec_id"), "left_anti")
              .select(prev.columns.map(col): _*)
          else prev
          if (hasDelta)
            kept.unionByName(assignCells(
              Versioned.readAt(spark, lakeBase, "embeddings_delta", v),
              codebookFromIndex(prev)))
          else kept
        case _ =>
          val full = Versioned.readAt(spark, lakeBase, "embeddings", v)
          assignCells(full, frozenCodebook(full))
      }
  }

  // --------------------------------------------------------------- q68
  /** IVF cell purity — the unsupervised-clustering quality report over
    * [[q51IvfAssign]]'s cells: per cell, how many vectors landed there
    * and what fraction share the cell's majority `label`. The eval a
    * pipeline runs after (re)training a coarse quantizer: purity
    * collapsing toward 1/|labels| means the cells carry no structure
    * and ANN probe counts need raising.
    *
    * Scale shape: the per-(cell, label) counts are one hash-agg pass
    * over the assignment; every aggregate after that (totals,
    * majority) runs on the COUNTS table — ≤ k×|labels| rows, the
    * q37a compressed-table discipline — so the rank window sorts a
    * few hundred rows, never vectors. */
  def q68CellPurity(spark: SparkSession, dir: String): DataFrame = {
    val counts = ivfIndex(spark, dir).select(col("vec_id"), col("cell"))
      .join(Tables(spark, dir, "embeddings").select(col("vec_id"), col("label")),
        "vec_id")
      .groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("cell"))
      .agg(sum(col("n")).as("n_vectors"))
    val majority = counts.withColumn("_r", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(col("n").desc, col("label").asc)))
      .filter(col("_r") === 1)
      .select(col("cell"), col("label").as("majority_label"),
        col("n").as("n_majority"))
    totals.join(majority, "cell")
      .select(col("cell"), col("n_vectors"), col("majority_label"),
        col("n_majority"),
        (col("n_majority").cast("double") / col("n_vectors").cast("double"))
          .as("purity"))
      .orderBy(col("cell"))
  }

  /** Embedding-cosine near-dup pairs: LSH-bucket blocking (cost
    * Σ bucket², never N²), exact fixed-point cosine inside buckets,
    * thresholded. The production dedup entry point for embedding
    * near-dups; planted-pair correctness in SimilaritySpec. */
  def embeddingNearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.9): DataFrame = {
    import graft.functions.VectorOps._
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("q6", vector_quantize(col("embedding")))
      .withColumn("nrm", normQ(dot_long(col("q6"), col("q6"))))
      .withColumn("bucket", lsh_bucket(col("q6")))
      .select("vec_id", "q6", "nrm", "bucket")
    emb.as("a").join(emb.as("b"),
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        cosineQ(dot_long(col("a.q6"), col("b.q6")), col("a.nrm"), col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // --------------------------------------------------------------- q38
  /** Near-dup summary over the corpus: candidate-pair and near-dup
    * counts at two thresholds (single deterministic row — testdata has
    * no planted dups, so counts are the stable observable; the pair
    * stream itself is [[embeddingNearDupPairs]]). */
  def q38EmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = embeddingNearDupPairs(spark, dir, threshold = -1.0)
    pairs.agg(
      count(lit(1)).as("n_candidate_pairs"),
      count(when(col("cosine") >= 0.9, 1)).as("n_neardup_090"),
      count(when(col("cosine") >= 0.5, 1)).as("n_neardup_050"))
  }

  // --------------------------------------------------------------- q102
  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus with the coarse quantizer, compare embeddings
    * only WITHIN a cluster, and prune every vector that has an
    * earlier-id neighbor above the cosine threshold — the one-pass
    * deterministic keep rule (lowest vec_id of each ε-ball survives).
    * Per vector: its cell, kept flag, and the pruning representative.
    *
    * Scale shape: the ONLY pair generator is the within-cell self-join
    * — Σ cell² with k ∝ N keeping cells bounded, never corpus² (the
    * SemDeDup argument; same cost model as the LSH families). The
    * keep rule is a single aggregate + left join — no iteration, no
    * connected components: unlike q41's transitive clusters, semantic
    * prune-vs-keep needs only "does an earlier neighbor exist", which
    * is embarrassingly parallel. The assignment ⋈ quantized-vector
    * table is localCheckpoint'd — three consumers (both self-join
    * sides + the final left join) would otherwise re-run the argmax
    * assignment scan. Only 4-byte-code-scale columns (q6, nrm) cross
    * the shuffle; raw float arrays never do.
    *
    * Cross-engine: assignment is q51's shared-CTE semantics; the pair
    * cosine is the q38 fixed-point discipline (exact decimal dot,
    * IEEE-double finish); threshold gaps ≫ 1 ulp on real data. */
  def q102SemanticDedup(spark: SparkSession, dir: String,
      threshold: Double = 0.35): DataFrame = {
    import graft.functions.VectorOps._
    // the persisted index replaces a localCheckpoint: all three
    // consumers below are narrow scans of the code table
    val v = ivfIndex(spark, dir)
    val pruned = v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        cosineQ(dot_long(col("a.q6"), col("b.q6")), col("a.nrm"), col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .groupBy(col("b.vec_id").as("vec_id"))
      .agg(min(col("a.vec_id")).as("pruned_by"))
    v.select(col("vec_id"), col("cell"))
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("pruned_by").isNull, 1).otherwise(0).as("kept"),
        col("pruned_by"))
      .orderBy(col("vec_id"))
  }

  // --------------------------------------------------------------- q71
  /** Per-label class centroids — the supervised counterpart of the
    * k-means re-estimation step: for every (label, dimension), the
    * exact component sum, the centroid mean, and the member count.
    * An embedding pipeline runs this to seed classifiers, audit label
    * coherence (centroid norms collapsing toward 0 under random
    * labels), and warm-start quantizer training.
    *
    * Cross-engine exactness: elements are float→double→DECIMAL(12,9)
    * (both engines round the same 17-digit value — the [[dotExact]]
    * discipline), widened to DECIMAL(28,9) before the sum so Spark's
    * accumulator lands at (38,9) — matching DuckDB's SUM width, and
    * overflow-proof up to 1e29 (a 12-billion-member label at
    * max-magnitude elements would overflow the default (22,9)
    * accumulator into NULL exactly at the scale this module
    * advertises) — summed exactly (decimal addition is associative ⇒
    * partition-order-proof), finished as doubles; the mean divides in
    * one IEEE expression both engines build identically.
    *
    * Scale shape: `posexplode` amplifies rows ×dim, but the partial
    * hash-aggregate combines map-side immediately — what crosses the
    * wire is |labels|×dim partial sums per task, not exploded rows.
    * One shuffle on the (label, pos) key; no window, no collect. */
  def q71LabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    // DECIMAL(12,9) holds |x| < 1000; a larger element would cast to
    // NULL in Spark's non-ANSI mode — silently vanishing from the sum
    // while still counted in n — where DuckDB raises on the same cast.
    // Fail loudly instead, so both engines reject out-of-domain
    // embeddings the same way rather than diverging.
    val xd = col("x").cast(DoubleType)
    val xq = when(abs(xd) < lit(1000.0), xd.cast(dec)).otherwise(
      raise_error(concat(
        lit("q71: embedding element outside DECIMAL(12,9) domain (|x| >= 1000): "),
        col("x").cast(StringType))))
    Tables(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(xq.cast(DecimalType(28, 9))).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos").cast("long").as("pos"),
        col("s").cast(DoubleType).as("component_sum"),
        (col("s").cast(DoubleType) / col("n").cast(DoubleType)).as("centroid"),
        col("n"))
      .orderBy(col("label"), col("pos"))
  }

  // --------------------------------------------------------------- q80
  /** Product-quantization encoder: each 64-dim embedding → 4 codes,
    * one per 16-dim subspace, by nearest-centroid assignment against
    * 8 deterministic centroids per subspace (the subvectors of the 8
    * lowest vec_ids — the [[q51IvfAssign]] seeding discipline, so the
    * codebook is reproducible without a stored model). PQ is the
    * memory side of the ANN story: 64 floats (256 B) compress to 4
    * codes (4 B), which is what makes a 100 TB embedding corpus fit
    * an in-memory distance table (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011).
    *
    * Cross-engine exactness: squared L2 per subspace in exact decimal
    * (diffs at DECIMAL(13,9), squares at scale 18, accumulator pinned
    * like [[dotExact]]); argmin per subspace is `array_position` of
    * the `array_min` over the 8 literal-codebook distances — the
    * FIRST index achieving the minimum, i.e. ties break to the lowest
    * centroid id (centroids are ordered by vec_id), the same total
    * order the oracle's window-min reproduces. Codes are integers, so
    * no float ever reaches the output.
    *
    * Scale shape: the 8-row codebook is collected once (bounded — the
    * [[q51IvfAssign]] codebook discipline) and inlined as literals,
    * so encoding is a PURE MAP-SIDE PROJECTION: no join, no
    * aggregate, no shuffle (a first draft assigned via crossJoin +
    * `min(struct)` groupBy, which planned as a SortAggregate over N×8
    * rows — the q56 lesson, structs are not hash-aggregable). At
    * production scale the codebook comes from k-means
    * ([[graft.operators.CoarseQuantizer]]) and is still ≤ k×dim
    * floats — literal inlining holds. */
  def q80PqEncode(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    // the 64 per-row centroid distances are scan-stage CPU — spread
    // the single-file scan (codebook collect stays on the raw scan)
    pqEncodeWith(graft.operators.Spread.byKey(emb, col("vec_id")),
      emb.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id"), col("embedding")).collect())
      .orderBy(col("vec_id"))
  }

  /** PQ encode under an EXPLICIT codebook (rows of (vec_id,
    * embedding)) — q80's kernel factored so the incremental chain
    * (q124) encodes deltas under the chain-frozen codebook. Pure
    * map-side projection; see [[q80PqEncode]]'s scaladoc. */
  private[graft] def pqEncodeWith(emb: DataFrame,
      cents: Array[org.apache.spark.sql.Row]): DataFrame = {
    val numSub = 4; val subDim = 16
    val cids = cents.map(_.getLong(0)).toSeq
    val codes = (0 until numSub).map { s =>
      val dists = cents.indices.map { c =>
        val sub = cents(c).getSeq[Float](1)
          .slice(s * subDim, (s + 1) * subDim)
        sqDistExact(slice(col("embedding"), s * subDim + 1, subDim),
          typedLit(sub))
      }
      val arr = array(dists: _*)
      element_at(typedLit(cids),
        array_position(arr, array_min(arr)).cast("int")).as(s"code$s")
    }
    emb.select(col("vec_id") +: codes: _*)
  }

  // --------------------------------------------------------------- q124
  /** Incremental maintenance of the PQ code table — the LAST of the
    * persisted artifact families still rebuilding per corpus version
    * (r13 named win-/signature/IVF/PQ/vocab; the others gained chains
    * in q113/q114/q115/q123). Same physics as the IVF chain: codes
    * only mean anything under the codebook that produced them, so the
    * codebook FREEZES at chain origin — here persisted as its own
    * tiny artifact (the 8 training vectors), because unlike IVF's
    * cell table the code rows cannot reconstruct their centroids, and
    * the lake's GC must not be able to collect the chain's geometry
    * out from under it. Maintenance is then pure append:
    * `codes(v) = codes(v−1) ∪ encode(delta, frozen codebook)` — a
    * map-side projection over delta vectors, never a corpus re-encode
    * (file-exact in the spec). Retrain = the full-rebuild fallback
    * branch, exactly as IVF. The oracle replays the global encode
    * under the standing-split codebook (q115's oracle convention), so
    * hash equality proves the chain's codes are indistinguishable
    * from a one-shot encode under the same frozen geometry. */
  def q124IncrPq(spark: SparkSession, dir: String): DataFrame = {
    val base = versionedVectors(spark, dir)
    pqCodesAt(spark, base, 1L) // v1 first: origin freezes the codebook
    pqCodesAt(spark, base, 2L).orderBy(col("vec_id"))
  }

  private[graft] def pqCodesArtifact(lakeBase: String, v: Long): String =
    s"$lakeBase-pq-v$v"

  /** Chain-frozen PQ training vectors — version-less: one codebook
    * per chain, by construction. */
  private[graft] def pqCodebookArtifact(lakeBase: String): String =
    s"$lakeBase-pq-cb"

  /** The PQ code table AT lake version `v`, maintained by
    * frozen-codebook append ([[q124IncrPq]]'s engine). */
  private[graft] def pqCodesAt(spark: SparkSession, lakeBase: String,
      v: Long): DataFrame =
    graft.sources.ArtifactStore.readOrPublish(
      spark, pqCodesArtifact(lakeBase, v))(
      incrementalPqFrame(spark, lakeBase, v))

  /** Maintenance frame behind [[pqCodesAt]] — append under the frozen
    * codebook artifact; fallback = full (re)build, which also
    * (re)publishes the codebook. */
  private[graft] def incrementalPqFrame(spark: SparkSession,
      lakeBase: String, v: Long): DataFrame = {
    import graft.sources.{ArtifactStore, Versioned}
    val hasDelta = Versioned.tableExists(spark, lakeBase, "embeddings_delta", v)
    val hasRemoved =
      Versioned.tableExists(spark, lakeBase, "embeddings_removed", v)
    ArtifactStore.readIfPresent(spark, pqCodesArtifact(lakeBase, v - 1))
      match {
        case Some(prev) if hasDelta || hasRemoved =>
          // vec-keyed codes ⇒ exact tombstone anti-join; the frozen
          // codebook is its own artifact, so removing a training
          // vector's data row never touches the chain's geometry
          val kept = if (hasRemoved)
            prev.join(
              Versioned.readAt(spark, lakeBase, "embeddings_removed", v)
                .select(col("vec_id")), Seq("vec_id"), "left_anti")
              .select(prev.columns.map(col): _*)
          else prev
          if (!hasDelta) kept else {
          val cb = ArtifactStore
            .readIfPresent(spark, pqCodebookArtifact(lakeBase))
            .getOrElse(sys.error(
              s"pq chain at $lakeBase has codes but no codebook artifact"))
            .orderBy(col("vec_id")).collect() // 8 rows by construction
          kept.unionByName(pqEncodeWith(
            Versioned.readAt(spark, lakeBase, "embeddings_delta", v), cb))
          }
        case _ =>
          val full = Versioned.readAt(spark, lakeBase, "embeddings", v)
          val cb = ArtifactStore.readOrPublish(
            spark, pqCodebookArtifact(lakeBase))(
            full.orderBy(col("vec_id")).limit(8)
              .select(col("vec_id"), col("embedding")))
            .orderBy(col("vec_id")).collect()
          pqEncodeWith(full, cb)
      }
  }

  /** Root for persisted PQ code tables (override:
    * `SPARK_GRAFT_PQ_DIR`). */
  private[graft] val pqBase: String =
    sys.env.getOrElse("SPARK_GRAFT_PQ_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/") +
        "/graft-pqcodes")

  /** The PQ code table as a PERSISTED parquet artifact — the entire
    * point of product quantization in production: encode once, store
    * the 4-byte-per-vector codes, and answer every ADC query against
    * the code table without touching the float corpus. Keyed by the
    * embeddings files' metadata fingerprint (the [[graft.sources
    * .ArtifactStore]] content-address contract — staleness impossible,
    * check is one listing); content is exactly [[q80PqEncode]], whose
    * decimal argmin is deterministic, so persisted vs recomputed codes
    * are value-identical and the q83 oracle is unaffected. */
  private[graft] def pqCodesIndex(spark: SparkSession, dir: String)
      : DataFrame = {
    val key = graft.Tables.fileFingerprint(spark, s"$dir/embeddings.parquet")
    graft.sources.ArtifactStore.readOrPublish(spark, s"$pqBase/$key")(
      q80PqEncode(spark, dir))
  }

  // --------------------------------------------------------------- q82
  /** IVF posting-list imbalance: cell-size spread plus FAISS's
    * imbalance factor k·Σnᵢ²/N² over [[q51IvfAssign]]'s cells (1.0 =
    * perfectly balanced; higher = probe latency dominated by hot
    * cells). The load-balance health check a pipeline runs after
    * (re)training a coarse quantizer — [[q68CellPurity]] answers "do
    * the cells carry structure", this answers "are they evenly
    * loaded", and both run on the same assignment pass. k is the
    * count of NON-EMPTY cells (empty cells cost no probe time).
    *
    * Cross-engine exactness: cell sizes are BIGINT; Σnᵢ² accumulates
    * in DECIMAL(38,0) (exact while Σnᵢ² < 10^38 — nᵢ ≤ 10^12 members
    * across 10^12 cells stays within it, the q70 widening
    * discipline); the factor divides out in ONE IEEE expression.
    *
    * Scale shape: one hash-agg over the assignment to ≤k cell sizes,
    * then a single-row re-aggregate of the tiny counts table. */
  def q82IvfImbalance(spark: SparkSession, dir: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val sizes = ivfIndex(spark, dir).select(col("vec_id"), col("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_i"))
    sizes.agg(
      count(lit(1)).as("k_cells"),
      sum(col("n_i")).as("n_vectors"),
      min(col("n_i")).as("min_cell"),
      max(col("n_i")).as("max_cell"),
      sum(col("n_i").cast(d19) * col("n_i").cast(d19)).as("_ss"))
      .select(col("k_cells"), col("n_vectors"),
        col("min_cell"), col("max_cell"),
        (col("k_cells").cast(DoubleType) * col("_ss").cast(DoubleType) /
          (col("n_vectors").cast(DoubleType) *
            col("n_vectors").cast(DoubleType))).as("imbalance"))
  }

  // --------------------------------------------------------------- q83
  /** PQ asymmetric-distance (ADC) top-5 search over the q80 codes —
    * the query side of product quantization (Jégou et al. 2011): per
    * query, distances to each subspace centroid are tabulated ONCE
    * (k×m small decimals), and every corpus vector is scored by four
    * table lookups on its codes — the full float corpus is never
    * touched at query time. The recall/compression trade-off against
    * exact kNN (q21) is measured in SimilaritySpec.
    *
    * Cross-engine exactness: the distance tables are [[sqDistExact]]
    * decimals; an ADC score is the sum of four exact decimals, so
    * ranking (score ASC, neighbor ASC) is a total order both engines
    * agree on bit-for-bit; the reported score rounds the exact value
    * to 9 decimals only at the output boundary (the q21 discipline).
    *
    * Scale shape: codes (4 B/vector) come from the PERSISTED
    * [[pqCodesIndex]] — encoded once per corpus, never re-derived at
    * query time — and the broadcast distance tables are all the
    * search touches — the classic memory-resident ANN layout; the
    * per-query top-k here is a rank window over the scored stream
    * (fine for a query batch; a serving path would per-partition
    * TakeOrdered first, the q21/q4 discipline). */
  def q83PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val numSub = 4; val subDim = 16; val k = 8; val topK = 5
    val emb = Tables(spark, dir, "embeddings")
    def subs(c: Column, p: String): Seq[Column] =
      (0 until numSub).map(s =>
        slice(c, s * subDim + 1, subDim).as(s"$p$s"))
    val cents = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid") +: subs(col("embedding"), "c"): _*)
    val queries10 = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id") +: subs(col("embedding"), "q"): _*)
    // per-query distance table: k×m exact decimals, computed once
    val dtab = queries10.crossJoin(broadcast(cents))
      .select(col("query_id") +: col("cid") +:
        (0 until numSub).map(s =>
          sqDistExact(col(s"q$s"), col(s"c$s")).as(s"e$s")): _*)
      .localCheckpoint() // HOF pipeline: materialize before 4 reuses
    val scored = (0 until numSub).foldLeft(
      pqCodesIndex(spark, dir)
        .crossJoin(broadcast(queries10.select(col("query_id"))))) {
      (acc, s) =>
        acc.join(
          broadcast(dtab.select(col("query_id").as(s"_q$s"),
            col("cid").as(s"_c$s"), col(s"e$s"))),
          col("query_id") === col(s"_q$s") &&
            col(s"code$s") === col(s"_c$s"))
          .drop(s"_q$s", s"_c$s")
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_dist"), col("neighbor_id"))
    scored
      .withColumn("_dist",
        (0 until numSub).map(s => col(s"e$s")).reduce(_ + _))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("_dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .withColumn("adc_dist", round(col("_dist").cast(DoubleType), 9))
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adc_dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_pq_encode"    -> (q80PqEncode _),
    "q82_ivf_imbalance" -> (q82IvfImbalance _),
    "q83_pq_adc"       -> (q83PqAdc _),
    "q21_knn_brute"    -> (q21KnnBrute _),
    "q22_lsh_buckets"  -> (q22LshBuckets _),
    "q23_ivf_ann"      -> (q23IvfAnn _),
    "q38_embed_neardup" -> (q38EmbedNearDup _),
    "q102_semantic_dedup" -> ((s: SparkSession, d: String) => q102SemanticDedup(s, d)),
    "q103_delta_embed_dedup" -> (q103DeltaEmbedDedup _),
    "q51_ivf_assign"   -> (q51IvfAssign _),
    "q68_cell_purity"  -> (q68CellPurity _),
    "q71_label_centroids" -> (q71LabelCentroids _),
    "q115_incr_ivf_index" -> (q115IncrIvfIndex _),
    "q132_ivf_serve" -> ((s: SparkSession, d: String) => q132IvfServe(s, d)),
    "q124_incr_pq" -> (q124IncrPq _))

  /** q51's deterministic assignment (k lowest-vec_id centroids, exact
    * decimal dots, argmax with highest-label tie-break) as a reusable
    * oracle CTE — shared verbatim by the q51 and q68 oracles so the
    * assignment semantics can't drift between them. The codebook
    * predicate is a parameter so q115 can replay the SAME assignment
    * under the standing-split codebook its frozen chain pins. */
  private def ivfAssignCteWith(cbFilter: String): String =
    s"""WITH n AS (
      | SELECT vec_id, embedding,
      |  sqrt(CAST(list_sum(list_transform(range(1, len(embedding)+1),
      |    i -> CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)) AS nrm
      | FROM embeddings),
      |p AS (
      | SELECT v.vec_id, c.vec_id AS c_label,
      |  CAST(list_sum(list_transform(range(1, len(v.embedding)+1),
      |    i -> CAST(CAST(v.embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
      |   / (v.nrm * c.nrm) AS cosine
      | FROM n v JOIN n c ON $cbFilter),
      |r AS (
      | SELECT vec_id, c_label, cosine,
      |  ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY cosine DESC, c_label DESC) AS rn
      | FROM p)""".stripMargin

  private val ivfAssignCte = ivfAssignCteWith("c.vec_id < 10")

  /** Per-subspace exact squared-L2 term for the q80 oracle: the diff
    * expression is written twice (squared) because DuckDB lambdas
    * can't bind a local. */
  private def pqDistSql(s: Int): String = {
    val dv = s"CAST(CAST(v.embedding[${s * 16} + i] AS DOUBLE) AS DECIMAL(12,9))"
    val dc = s"CAST(CAST(c.ce[${s * 16} + i] AS DOUBLE) AS DECIMAL(12,9))"
    s"list_sum(list_transform(range(1, 17), i -> ($dv - $dc) * ($dv - $dc)))"
  }

  val oracle: Map[String, String] = Map(
    // q80: same decimal element discipline; DuckDB's decimal list_sum
    // lands at DECIMAL(38,18) — exact, so distance equality (and
    // therefore the argmin with lowest-cid tie-break) matches Spark's
    // min(struct) bit-for-bit
    "q80_pq_encode" ->
      s"""WITH c AS (
        | SELECT vec_id AS cid, embedding AS ce
        | FROM embeddings ORDER BY vec_id LIMIT 8),
        |p AS (
        | SELECT v.vec_id, c.cid,
        |  ${pqDistSql(0)} AS d0, ${pqDistSql(1)} AS d1,
        |  ${pqDistSql(2)} AS d2, ${pqDistSql(3)} AS d3
        | FROM embeddings v CROSS JOIN c),
        |m AS (
        | SELECT vec_id, cid, d0, d1, d2, d3,
        |  MIN(d0) OVER (PARTITION BY vec_id) AS m0,
        |  MIN(d1) OVER (PARTITION BY vec_id) AS m1,
        |  MIN(d2) OVER (PARTITION BY vec_id) AS m2,
        |  MIN(d3) OVER (PARTITION BY vec_id) AS m3
        | FROM p)
        |SELECT vec_id,
        | CAST(MIN(CASE WHEN d0 = m0 THEN cid END) AS BIGINT) AS code0,
        | CAST(MIN(CASE WHEN d1 = m1 THEN cid END) AS BIGINT) AS code1,
        | CAST(MIN(CASE WHEN d2 = m2 THEN cid END) AS BIGINT) AS code2,
        | CAST(MIN(CASE WHEN d3 = m3 THEN cid END) AS BIGINT) AS code3
        |FROM m GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // q71: same float→double→DECIMAL(12,9) element discipline as the
    // dot-product oracles; decimal SUM is exact in both engines, and
    // the mean is the identical IEEE division
    "q71_label_centroids" ->
      """WITH u AS (
        | SELECT label, u.pos AS pos,
        |  CAST(CAST(u.x AS DOUBLE) AS DECIMAL(12,9)) AS x
        | FROM (SELECT label, unnest(list_transform(range(1, len(embedding)+1),
        |   i -> {'pos': i - 1, 'x': embedding[i]})) AS u
        |   FROM embeddings) u)
        |SELECT label, CAST(pos AS BIGINT) AS pos,
        | CAST(SUM(x) AS DOUBLE) AS component_sum,
        | CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS centroid,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM u GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    // q38: assembled from the two proven pieces — q22's splitmix64
    // bucket replay (blocking) and q21's exact-decimal cosine (the
    // pair kernel) — so the near-dup SUMMARY is hash-checked end to
    // end, not just its components. Candidate counts depend only on
    // exact integer bucket equality; the threshold counts compare the
    // identical IEEE expression both engines build.
    "q38_embed_neardup" ->
      """WITH ij AS (
        |  SELECT i.i AS i, j.j AS j, (i.i*16 + j.j)::HUGEINT AS x
        |  FROM (SELECT unnest(range((SELECT MAX(len(embedding))
        |                             FROM embeddings))) AS i) AS i,
        |       range(0, 16) AS j(j)),
        |s0 AS (SELECT i, j,
        |  (x + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS z FROM ij),
        |s1 AS (SELECT i, j, xor(z::UBIGINT, z::UBIGINT >> 30)::HUGEINT AS a FROM s0),
        |s2 AS (SELECT i, j,
        |  (((a % 4294967296) * 3210233709) % 4294967296 * 4294967296 + a * 484763065)
        |    % 18446744073709551616::HUGEINT AS z FROM s1),
        |s3 AS (SELECT i, j, xor(z::UBIGINT, z::UBIGINT >> 27)::HUGEINT AS a FROM s2),
        |s4 AS (SELECT i, j,
        |  (((a % 4294967296) * 2496678331) % 4294967296 * 4294967296 + a * 321982955)
        |    % 18446744073709551616::HUGEINT AS z FROM s3),
        |sg AS (SELECT i, j,
        |  CASE WHEN (xor(z::UBIGINT, z::UBIGINT >> 31) % 2) = 1
        |       THEN 1 ELSE -1 END AS sgn FROM s4),
        |q AS (
        |  SELECT vec_id, u.pos AS pos, u.qv AS qv
        |  FROM (SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> {'pos': i - 1,
        |          'qv': CAST(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * 1000000 AS BIGINT)})) AS u
        |  FROM embeddings) u),
        |acc AS (
        |  SELECT q.vec_id, sg.j, sum(sg.sgn * q.qv) AS acc
        |  FROM q JOIN sg ON q.pos = sg.i GROUP BY q.vec_id, sg.j),
        |bucket AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN acc > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM acc GROUP BY vec_id),
        |n AS (
        | SELECT vec_id, embedding,
        |  sqrt(CAST(list_sum(list_transform(range(1, len(embedding)+1),
        |    i -> CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)) AS nrm
        | FROM embeddings),
        |pc AS (
        | SELECT CAST(list_sum(list_transform(range(1, len(qa.embedding)+1),
        |    i -> CAST(CAST(qa.embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(qb.embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
        |   / (qa.nrm * qb.nrm) AS cosine
        | FROM bucket a
        | JOIN bucket b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        | JOIN n qa ON qa.vec_id = a.vec_id
        | JOIN n qb ON qb.vec_id = b.vec_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
        | CAST(COUNT(CASE WHEN cosine >= 0.9 THEN 1 END) AS BIGINT) AS n_neardup_090,
        | CAST(COUNT(CASE WHEN cosine >= 0.5 THEN 1 END) AS BIGINT) AS n_neardup_050
        |FROM pc""".stripMargin,
    "q21_knn_brute" ->
      """WITH n AS (
        | SELECT vec_id, embedding,
        |  sqrt(CAST(list_sum(list_transform(range(1, len(embedding)+1),
        |    i -> CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)) AS nrm
        | FROM embeddings),
        |p AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  CAST(list_sum(list_transform(range(1, len(q.embedding)+1),
        |    i -> CAST(CAST(q.embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
        |   / (q.nrm * c.nrm) AS cosine
        | FROM n q JOIN n c ON c.vec_id <> q.vec_id
        | WHERE q.vec_id < 10),
        |r AS (
        | SELECT query_id, neighbor_id, cosine,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        | FROM p)
        |SELECT query_id, neighbor_id, rank, round(cosine, 9) AS cosine FROM r
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // VectorOps.lshBucket re-expressed: the sign table is data-free
    // (plane component (i,j) = parity bit of splitmix64(i*16+j)), so it
    // is materialized once as a dim×16 CTE — dim derived from the data
    // (MAX(len(embedding))), so a wider embedding widens the sign table
    // instead of silently dropping positions at the q⋈sg join.
    // splitmix64's two mod-2^64
    // multiplies split the constant into 32-bit halves so every HUGEINT
    // product stays under 2^96. qv is the same scale-6 fixed-point
    // value VectorQuantize produces (DECIMAL(12,6) HALF_UP).
    "q22_lsh_buckets" ->
      """WITH ij AS (
        |  SELECT i.i AS i, j.j AS j, (i.i*16 + j.j)::HUGEINT AS x
        |  FROM (SELECT unnest(range((SELECT MAX(len(embedding))
        |                             FROM embeddings))) AS i) AS i,
        |       range(0, 16) AS j(j)),
        |s0 AS (SELECT i, j,
        |  (x + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS z FROM ij),
        |s1 AS (SELECT i, j, xor(z::UBIGINT, z::UBIGINT >> 30)::HUGEINT AS a FROM s0),
        |s2 AS (SELECT i, j,
        |  (((a % 4294967296) * 3210233709) % 4294967296 * 4294967296 + a * 484763065)
        |    % 18446744073709551616::HUGEINT AS z FROM s1),
        |s3 AS (SELECT i, j, xor(z::UBIGINT, z::UBIGINT >> 27)::HUGEINT AS a FROM s2),
        |s4 AS (SELECT i, j,
        |  (((a % 4294967296) * 2496678331) % 4294967296 * 4294967296 + a * 321982955)
        |    % 18446744073709551616::HUGEINT AS z FROM s3),
        |sg AS (SELECT i, j,
        |  CASE WHEN (xor(z::UBIGINT, z::UBIGINT >> 31) & 1) = 1 THEN 1::BIGINT ELSE -1::BIGINT END AS sgn
        |  FROM s4),
        |q AS (
        |  SELECT vec_id, u.u.pos AS pos, u.u.qv AS qv
        |  FROM (SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> {'pos': i - 1,
        |          'qv': CAST(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * 1000000 AS BIGINT)})) AS u
        |  FROM embeddings) u),
        |acc AS (
        |  SELECT q.vec_id, sg.j, sum(sg.sgn * q.qv) AS acc
        |  FROM q JOIN sg ON q.pos = sg.i GROUP BY q.vec_id, sg.j),
        |bucket AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN acc > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM acc GROUP BY vec_id),
        |occ AS (SELECT bucket AS b2, CAST(count(*) AS BIGINT) AS n_bucket_mates
        |        FROM bucket GROUP BY bucket)
        |SELECT vec_id, bucket, n_bucket_mates
        |FROM bucket JOIN occ ON bucket = b2 ORDER BY vec_id""".stripMargin,
    // q21's exact-decimal dot/norm reused; the centroid table is the
    // k lowest vec_ids, rebuilt in SQL. Argmax tie-break (cosine DESC,
    // then HIGHEST label) mirrors Spark's max(struct(sim, c_label)).
    // q82: the shared assignment CTE rolled up to cell sizes; Σn²
    // accumulates in exact DECIMAL(38,0), the factor is ONE IEEE tree
    "q82_ivf_imbalance" -> (ivfAssignCte + ",\n" +
      """a AS (SELECT vec_id, c_label AS cell FROM r WHERE rn = 1),
        |cs AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_i
        |       FROM a GROUP BY cell)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k_cells,
        | CAST(SUM(n_i) AS BIGINT) AS n_vectors,
        | CAST(MIN(n_i) AS BIGINT) AS min_cell,
        | CAST(MAX(n_i) AS BIGINT) AS max_cell,
        | CAST(COUNT(*) AS DOUBLE)
        |   * CAST(SUM(CAST(n_i AS DECIMAL(19,0)) * CAST(n_i AS DECIMAL(19,0))) AS DOUBLE)
        |   / (CAST(SUM(n_i) AS DOUBLE) * CAST(SUM(n_i) AS DOUBLE)) AS imbalance
        |FROM cs""".stripMargin),
    // q83: the q80 code CTEs + per-query distance tables, ADC = the
    // sum of four exact decimals, ranked (dist ASC, neighbor ASC)
    "q83_pq_adc" ->
      s"""WITH c AS (
        | SELECT vec_id AS cid, embedding AS ce
        | FROM embeddings ORDER BY vec_id LIMIT 8),
        |p AS (
        | SELECT v.vec_id, c.cid,
        |  ${pqDistSql(0)} AS d0, ${pqDistSql(1)} AS d1,
        |  ${pqDistSql(2)} AS d2, ${pqDistSql(3)} AS d3
        | FROM embeddings v CROSS JOIN c),
        |m AS (
        | SELECT vec_id, cid, d0, d1, d2, d3,
        |  MIN(d0) OVER (PARTITION BY vec_id) AS m0,
        |  MIN(d1) OVER (PARTITION BY vec_id) AS m1,
        |  MIN(d2) OVER (PARTITION BY vec_id) AS m2,
        |  MIN(d3) OVER (PARTITION BY vec_id) AS m3
        | FROM p),
        |codes AS (
        | SELECT vec_id,
        |  MIN(CASE WHEN d0 = m0 THEN cid END) AS code0,
        |  MIN(CASE WHEN d1 = m1 THEN cid END) AS code1,
        |  MIN(CASE WHEN d2 = m2 THEN cid END) AS code2,
        |  MIN(CASE WHEN d3 = m3 THEN cid END) AS code3
        | FROM m GROUP BY vec_id),
        |dt AS (
        | SELECT v.vec_id AS query_id, c.cid,
        |  ${pqDistSql(0)} AS e0, ${pqDistSql(1)} AS e1,
        |  ${pqDistSql(2)} AS e2, ${pqDistSql(3)} AS e3
        | FROM embeddings v CROSS JOIN c WHERE v.vec_id < 10),
        |adc AS (
        | SELECT t0.query_id, co.vec_id AS neighbor_id,
        |  t0.e0 + t1.e1 + t2.e2 + t3.e3 AS dist
        | FROM codes co
        |  JOIN dt t0 ON t0.cid = co.code0
        |  JOIN dt t1 ON t1.query_id = t0.query_id AND t1.cid = co.code1
        |  JOIN dt t2 ON t2.query_id = t0.query_id AND t2.cid = co.code2
        |  JOIN dt t3 ON t3.query_id = t0.query_id AND t3.cid = co.code3
        | WHERE co.vec_id <> t0.query_id),
        |rk AS (
        | SELECT query_id, neighbor_id, dist,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY dist ASC, neighbor_id ASC) AS BIGINT) AS rank
        | FROM adc)
        |SELECT query_id, neighbor_id, rank,
        | round(CAST(dist AS DOUBLE), 9) AS adc_dist
        |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q51_ivf_assign" -> (ivfAssignCte + "\n" +
      """SELECT vec_id, CAST(c_label AS BIGINT) AS cell,
        | round(cosine, 9) AS cosine
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin),
    // q115: the from-scratch replay of the frozen-centroid contract —
    // codebook restricted to the STANDING split's vec_id<10 vectors
    // (what v1 froze), every vector assigned under it. Hash equality
    // proves append(assign(delta, frozen)) ≡ one global assignment.
    "q115_incr_ivf_index" -> (ivfAssignCteWith(
      s"c.vec_id < 10 AND (${TextOps.md5UniformSql("c.vec_id")}) >= 0.1") +
      "\n" +
      """SELECT vec_id, CAST(c_label AS BIGINT) AS cell
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin),
    // q132: the full serving replay under the same standing-split
    // codebook — assignment CTE (rn=1 → cells), probe CTE (rn≤2 →
    // the queries' cells), decimal pair cosine inside probed cells
    // only, rank. Hash equality proves the SERVED neighbors are the
    // from-scratch neighbors.
    "q132_ivf_serve" -> (ivfAssignCteWith(
      s"c.vec_id < 10 AND (${TextOps.md5UniformSql("c.vec_id")}) >= 0.1") +
      ",\n" +
      """asg AS (SELECT vec_id, c_label AS cell FROM r WHERE rn = 1),
        |probes AS (
        | SELECT vec_id AS query_id, c_label AS cell
        | FROM r WHERE vec_id < 3 AND rn <= 2),
        |pair AS (
        | SELECT p.query_id, a.vec_id AS neighbor_id,
        |  CAST(list_sum(list_transform(range(1, len(v.embedding)+1),
        |    i -> CAST(CAST(v.embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
        |   / (v.nrm * c.nrm) AS cosine
        | FROM probes p
        | JOIN asg a USING (cell)
        | JOIN n v ON v.vec_id = p.query_id
        | JOIN n c ON c.vec_id = a.vec_id
        | WHERE a.vec_id <> p.query_id),
        |rk AS (
        | SELECT query_id, neighbor_id, cosine,
        |  ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn2
        | FROM pair)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        | CAST(neighbor_id AS BIGINT) AS neighbor_id,
        | CAST(rn2 AS BIGINT) AS rank, ROUND(cosine, 9) AS cosine
        |FROM rk WHERE rn2 <= 5 ORDER BY query_id, rank""".stripMargin),
    // q124: q80's replay with the codebook CTE restricted to the
    // STANDING split (what the chain's origin froze) — the q115
    // oracle convention applied to product quantization. Hash
    // equality proves append(encode(delta, frozen)) is
    // indistinguishable from one global encode under that codebook.
    "q124_incr_pq" ->
      s"""WITH c AS (
        | SELECT vec_id AS cid, embedding AS ce
        | FROM embeddings
        | WHERE (${TextOps.md5UniformSql("vec_id")}) >= 0.1
        | ORDER BY vec_id LIMIT 8),
        |p AS (
        | SELECT v.vec_id, c.cid,
        |  ${pqDistSql(0)} AS d0, ${pqDistSql(1)} AS d1,
        |  ${pqDistSql(2)} AS d2, ${pqDistSql(3)} AS d3
        | FROM embeddings v CROSS JOIN c),
        |m AS (
        | SELECT vec_id, cid, d0, d1, d2, d3,
        |  MIN(d0) OVER (PARTITION BY vec_id) AS m0,
        |  MIN(d1) OVER (PARTITION BY vec_id) AS m1,
        |  MIN(d2) OVER (PARTITION BY vec_id) AS m2,
        |  MIN(d3) OVER (PARTITION BY vec_id) AS m3
        | FROM p)
        |SELECT vec_id,
        | CAST(MIN(CASE WHEN d0 = m0 THEN cid END) AS BIGINT) AS code0,
        | CAST(MIN(CASE WHEN d1 = m1 THEN cid END) AS BIGINT) AS code1,
        | CAST(MIN(CASE WHEN d2 = m2 THEN cid END) AS BIGINT) AS code2,
        | CAST(MIN(CASE WHEN d3 = m3 THEN cid END) AS BIGINT) AS code3
        |FROM m GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // q103: the shared assignment CTE, the md5-uniform delta split
    // (TextOps.md5UniformSql — the ONE definition), cell occupancy of
    // the corpus side, and the q38 decimal-dot verify with MIN target
    "q103_delta_embed_dedup" -> (ivfAssignCte + ",\n" +
      s"""a AS (SELECT vec_id, c_label AS cell,
        |  (${TextOps.md5UniformSql("vec_id")}) < 0.1 AS is_delta
        | FROM r WHERE rn = 1),
        |occ AS (
        | SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_candidates
        | FROM a WHERE NOT is_delta GROUP BY cell),
        |pc AS (
        | SELECT d.vec_id AS dv, c.vec_id AS cv,
        |  CAST(list_sum(list_transform(range(1, len(qd.embedding)+1),
        |    i -> CAST(CAST(qd.embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(qc.embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
        |   / (qd.nrm * qc.nrm) AS cosine
        | FROM a d JOIN a c ON d.cell = c.cell AND d.is_delta AND NOT c.is_delta
        | JOIN n qd ON qd.vec_id = d.vec_id
        | JOIN n qc ON qc.vec_id = c.vec_id),
        |v AS (
        | SELECT dv AS vec_id, CAST(MIN(cv) AS BIGINT) AS dup_of
        | FROM pc WHERE cosine >= 0.35 GROUP BY dv)
        |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
        | COALESCE(occ.n_candidates, 0) AS n_candidates,
        | CAST(CASE WHEN v.dup_of IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,
        | v.dup_of
        |FROM a LEFT JOIN occ ON occ.cell = a.cell
        |LEFT JOIN v ON v.vec_id = a.vec_id
        |WHERE a.is_delta ORDER BY a.vec_id""".stripMargin),
    // q102: the shared assignment CTE for cells (its `n` CTE also
    // supplies the norms), the q38 decimal-dot pair cosine inside a
    // cell, and the one-pass lowest-id dominance rule as MIN + LEFT
    // JOIN — the same three proven pieces the Spark plan composes
    "q102_semantic_dedup" -> (ivfAssignCte + ",\n" +
      """a AS (SELECT vec_id, c_label AS cell FROM r WHERE rn = 1),
        |pc AS (
        | SELECT x.vec_id AS va, y.vec_id AS vb,
        |  CAST(list_sum(list_transform(range(1, len(qa.embedding)+1),
        |    i -> CAST(CAST(qa.embedding[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(qb.embedding[i] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
        |   / (qa.nrm * qb.nrm) AS cosine
        | FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
        | JOIN n qa ON qa.vec_id = x.vec_id
        | JOIN n qb ON qb.vec_id = y.vec_id),
        |pr AS (
        | SELECT vb AS vec_id, CAST(MIN(va) AS BIGINT) AS pruned_by
        | FROM pc WHERE cosine >= 0.35 GROUP BY vb)
        |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
        | CASE WHEN pr.pruned_by IS NULL THEN 1 ELSE 0 END AS kept,
        | pr.pruned_by
        |FROM a LEFT JOIN pr ON pr.vec_id = a.vec_id
        |ORDER BY a.vec_id""".stripMargin),
    // q68: the shared assignment CTE joined to each vector's label;
    // totals and majority both derive from the (cell, label) COUNTS
    // table, mirroring the Spark plan
    "q68_cell_purity" -> (ivfAssignCte + ",\n" +
      """a AS (SELECT vec_id, CAST(c_label AS BIGINT) AS cell
        |      FROM r WHERE rn = 1),
        |l AS (SELECT a.cell, e.label
        |      FROM a JOIN embeddings e ON a.vec_id = e.vec_id),
        |c AS (SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM l GROUP BY cell, label),
        |t AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS n_vectors
        |      FROM c GROUP BY cell),
        |m AS (SELECT cell, label AS majority_label, n AS n_majority,
        |      ROW_NUMBER() OVER (PARTITION BY cell
        |        ORDER BY n DESC, label ASC) AS rn2
        |      FROM c)
        |SELECT t.cell, t.n_vectors, m.majority_label, m.n_majority,
        | CAST(m.n_majority AS DOUBLE) / CAST(t.n_vectors AS DOUBLE)
        |   AS purity
        |FROM t JOIN m ON t.cell = m.cell AND m.rn2 = 1
        |ORDER BY t.cell""".stripMargin))
}
