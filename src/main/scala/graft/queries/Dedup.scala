package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.SimHash64.simhash64

/** Near-duplicate detection for LLM-data pipelines: MinHash+LSH,
  * SimHash, n-gram Jaccard. The MinHash path is deliberately built on
  * MD5-string minima (lexicographic min over seeded `md5` values) so
  * the whole signature pipeline — shingle → minhash → band — is
  * reproducible in ANSI SQL and DuckDB-oracle-checkable, not just
  * "runs without error".
  *
  * Scale shape: signatures are computed array-native per row (narrow,
  * codegen, no shuffle); the only shuffle is the band-key groupBy,
  * whose fan-in is bounded by band cardinality. Candidate pairs are
  * generated per-bucket, so cost is Σ bucket² not N² — the standard
  * LSH cost model (Broder; Leskovec et al., "Mining of Massive
  * Datasets" ch. 3).
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  val NumHashes = 8
  val BandSize = 2 // 4 bands of 2 minhashes

  /** Word 3-gram shingles as an array column (0-based Spark `[]`).
    * Guarded for <3-token documents: `sequence(0, size-3)` counts DOWN
    * when size-3 < 0 (step inferred −1), and the resulting negative
    * array index is a hard `INVALID_ARRAY_INDEX` under Spark 4's
    * default ANSI mode — a real corpus WILL contain 1–2-token docs, so
    * short docs get an empty shingle set (⇒ null minhashes/bands,
    * which LSH then never buckets). */
  private val shinglesExpr =
    """CASE WHEN size(split(text, '\\s+')) >= 3 THEN
      |  transform(sequence(0, size(split(text, '\\s+')) - 3),
      |    i -> concat_ws(' ', split(text, '\\s+')[i],
      |                        split(text, '\\s+')[i+1],
      |                        split(text, '\\s+')[i+2]))
      |ELSE array() END""".stripMargin

  private def minhash(seed: Int): String =
    s"array_min(transform(sh, x -> md5(concat('$seed#', x))))"

  /** The signature pipeline over any `(doc_id, text)` frame — split out
    * of [[q18MinhashLsh]] so the short-document guard is testable on
    * crafted inputs. Band keys use null-propagating `concat` (NOT
    * `concat_ws`) so a short doc's null minhashes yield null bands —
    * exactly what `mh0 || '|' || mh1` does in the DuckDB oracle. */
  def minhashSignatures(docsDf: DataFrame): DataFrame = {
    val withSh = docsDf.withColumn("sh", expr(shinglesExpr))
    val withMh = (0 until NumHashes).foldLeft(withSh) { (df, i) =>
      df.withColumn(s"mh$i", expr(minhash(i)))
    }
    val withBands = (0 until NumHashes / BandSize).foldLeft(withMh) { (df, b) =>
      val parts = (0 until BandSize).map(j => col(s"mh${b * BandSize + j}"))
      val joined = parts.tail.foldLeft(parts.head)((acc, c) =>
        concat(acc, lit("|"), c))
      df.withColumn(s"band$b", md5(joined))
    }
    withBands
      .select((col("doc_id") +:
        (0 until NumHashes).map(i => col(s"mh$i")) ++:
        (0 until NumHashes / BandSize).map(b => col(s"band$b"))): _*)
  }

  // --------------------------------------------------------------- q18
  /** MinHash signatures + LSH band keys per document. Band keys are
    * md5 of adjacent minhash pairs; equal band key ⇒ candidate pair.
    * Emitted per-doc (deterministic, N rows) — pair generation is the
    * groupBy in [[minhashCandidatePairs]]. */
  def q18MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashSignatures(docs(spark, dir)).orderBy(col("doc_id"))

  /** LSH candidate pairs: docs sharing any band bucket, verified with
    * estimated Jaccard (fraction of equal minhashes). The production
    * dedup entry point; exercised with planted near-dups in tests. */
  def minhashCandidatePairs(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val sig = q18MinhashLsh(spark, dir)
    val bands = (0 until NumHashes / BandSize).map(b =>
      sig.select(col("doc_id"), col(s"band$b").as("bucket")))
      .reduce(_ unionByName _)
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sigA = sig.select((col("doc_id").as("doc_a") +:
      (0 until NumHashes).map(i => col(s"mh$i").as(s"a_mh$i"))): _*)
    val sigB = sig.select((col("doc_id").as("doc_b") +:
      (0 until NumHashes).map(i => col(s"mh$i").as(s"b_mh$i"))): _*)
    val est = (0 until NumHashes)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / lit(NumHashes.toDouble)
    pairs.join(sigA, "doc_a").join(sigB, "doc_b")
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  // --------------------------------------------------------------- q19
  /** SimHash near-dup fingerprints via the native [[SimHash64]]
    * Catalyst expression (codegen'd). Oracle-checked: the FNV-1a/lane
    * voting pipeline is reproduced in DuckDB SQL with HUGEINT
    * mod-2^64 arithmetic (see `oracle`), plus DedupSpec planted-pair
    * tests. */
  def q19Simhash(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      simhash64(split(col("text"), "\\s+")).as("simhash"),
      hex(simhash64(split(col("text"), "\\s+"))).as("simhash_hex"))
      .orderBy(col("doc_id"))

  /** SimHash near-dup pairs: 16-bit band blocking, then exact Hamming
    * distance ≤ maxHamming via bit_count(a XOR b). */
  def simhashNearDupPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 6): DataFrame = {
    val sig = docs(spark, dir).select(col("doc_id"),
      simhash64(split(col("text"), "\\s+")).as("simhash"))
    val banded = (0 until 4).map(b =>
        sig.select(col("doc_id"), col("simhash"),
          lit(b).as("band_no"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))
            .as("band")))
      .reduce(_ unionByName _)
    banded.as("a").join(banded.as("b"),
        col("a.band_no") === col("b.band_no") &&
        col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --------------------------------------------------------------- q20
  /** n-gram (word-set) Jaccard between each doc and its successor —
    * the verification kernel of near-dup dedup, with linear output so
    * it stays oracle-checkable at any scale. */
  def q20NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), "\\s+")).as("w"))
    d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        col("a.doc_id").as("doc_id"),
        col("b.doc_id").as("next_doc_id"),
        size(array_intersect(col("a.w"), col("b.w"))).as("n_shared"),
        (size(col("a.w")) + size(col("b.w"))
          - size(array_intersect(col("a.w"), col("b.w")))).as("n_union"),
        (size(array_intersect(col("a.w"), col("b.w"))).cast("double") /
          (size(col("a.w")) + size(col("b.w"))
            - size(array_intersect(col("a.w"), col("b.w")))).cast("double"))
          .as("jaccard"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_minhash_lsh"   -> (q18MinhashLsh _),
    "q19_simhash"       -> (q19Simhash _),
    "q20_ngram_jaccard" -> (q20NgramJaccard _))

  private val mhSelect = (0 until NumHashes).map(i =>
    s"list_min(list_transform(sh, x -> md5('$i#' || x))) AS mh$i").mkString(",\n |  ")

  val oracle: Map[String, String] = Map(
    "q18_minhash_lsh" ->
      s"""WITH w AS (
        | SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents),
        |sh AS (
        | SELECT doc_id, list_transform(range(1, len(ws) - 1),
        |   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sh FROM w),
        |mh AS (
        | SELECT doc_id,
        |  $mhSelect
        | FROM sh)
        |SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7,
        | md5(mh0 || '|' || mh1) AS band0,
        | md5(mh2 || '|' || mh3) AS band1,
        | md5(mh4 || '|' || mh5) AS band2,
        | md5(mh6 || '|' || mh7) AS band3
        |FROM mh ORDER BY doc_id""".stripMargin,
    // FNV-1a 64 + lane voting, exactly SimHash64.eval: token bytes come
    // from hex(encode(tok)) (true UTF-8 octets, not codepoints); the
    // mod-2^64 multiply stays exact because h < 2^64 and the 41-bit FNV
    // prime keep the product under HUGEINT's 2^127 ceiling. The final
    // HUGEINT→BIGINT reinterpretation mirrors the JVM's signed 64-bit
    // overflow.
    "q19_simhash" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(ws, tok ->
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, octet_length(encode(tok)) + 1),
        |          i -> (16*(strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i-1, 1))-1)
        |                 + strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i, 1))-1)::HUGEINT)),
        |      (acc, b) -> (xor(acc::UBIGINT, b::UBIGINT)::HUGEINT * 1099511628211::HUGEINT)
        |                   % 18446744073709551616::HUGEINT)) AS hs
        |  FROM w),
        |lanes AS (
        |  SELECT doc_id, b.b AS b,
        |    sum(CASE WHEN ((th.h::UBIGINT >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS lane
        |  FROM h, unnest(h.hs) AS th(h), range(0, 64) AS b(b)
        |  GROUP BY doc_id, b.b),
        |sim AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN lane > 0 THEN (1::UBIGINT << b)::HUGEINT ELSE 0::HUGEINT END) AS u
        |  FROM lanes GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |       THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS simhash,
        |  hex(CAST(u AS UBIGINT)) AS simhash_hex
        |FROM sim ORDER BY doc_id""".stripMargin,
    "q20_ngram_jaccard" ->
      """WITH d AS (
        | SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS w
        | FROM documents)
        |SELECT a.doc_id AS doc_id, b.doc_id AS next_doc_id,
        | len(list_filter(a.w, x -> list_contains(b.w, x))) AS n_shared,
        | len(a.w) + len(b.w) - len(list_filter(a.w, x -> list_contains(b.w, x))) AS n_union,
        | CAST(len(list_filter(a.w, x -> list_contains(b.w, x))) AS DOUBLE)
        |  / CAST(len(a.w) + len(b.w) - len(list_filter(a.w, x -> list_contains(b.w, x))) AS DOUBLE) AS jaccard
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_id""".stripMargin)
}
