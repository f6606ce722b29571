package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.{Dedup, TextOps}
import graft.streaming.StreamingEntityCanon

/** Streaming entity canonicalization ≡ batch q97: streaming the q97
  * delta names against the q97 standing catalog must resolve exactly
  * the names q97 resolves, with the same canonical keys — one shared
  * definition, proven, not assumed. */
class StreamingEntityCanonSpec extends SparkSpec {
  import spark.implicits._

  test("streamed entity canon resolves exactly the batch q97 names") {
    val in = Files.createTempDirectory("graft-ec-in").toString + "/parts"
    val out = Files.createTempDirectory("graft-ec-out").toString
    val parts = Tables(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_name"))
      .withColumn("_k", TextOps.uniformKeyOf(col("p_name")))
    parts.filter(col("_k") < 0.1).drop("_k").write.parquet(in)
    val catalog = parts.filter(col("_k") >= 0.1).drop("_k")

    val schema = spark.read.parquet(in).schema
    val q = StreamingEntityCanon.start(spark, in, out, schema, catalog)
    try q.awaitTermination(120000) finally q.stop()

    val batch = Dedup.q97DeltaEntityCanon(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getString(3)))).toMap
    val known = StreamingEntityCanon.readSink(spark, s"$out/known")
      .select($"p_name", $"canon_name").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val fresh = StreamingEntityCanon.readSink(spark, s"$out/fresh")
      .select($"p_name", $"canon_name").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    val batchKnown = batch.collect { case (n, (1L, c)) => n -> c }.toMap
    val batchFresh = batch.collect { case (n, (0L, c)) => n -> c }.toMap
    assert(known == batchKnown,
      s"stream/batch known divergence: $known vs $batchKnown")
    assert(fresh == batchFresh,
      "fresh sink must hold exactly the unmatched delta names")
    // fresh names self-canonicalize (total surrogate contract)
    assert(fresh.forall { case (n, c) => n == c })
    assert(known.nonEmpty && fresh.nonEmpty,
      "sf split should exercise both sinks")
    // every streamed PART ROW survives into exactly one sink
    val nRows = spark.read.parquet(in).count()
    val nOut = StreamingEntityCanon.readSink(spark, s"$out/known").count() +
      StreamingEntityCanon.readSink(spark, s"$out/fresh").count()
    assert(nOut == nRows, s"row conservation: $nOut of $nRows")
  }

  test("redelivering a batchId does not duplicate rows in either sink") {
    val out = Files.createTempDirectory("graft-ec-replay").toString
    // "red gear" ≈ "hot gear" (lev 3, same block) cluster with canon
    // "hot gear"; "redd gear" matches "red gear" (lev 1) and resolves
    // to that cluster's canon. "brand new widget" blocks alone.
    val catalog = Seq((100L, "red gear"), (101L, "hot gear"))
      .toDF("p_partkey", "p_name")
    val batch = Seq((1L, "redd gear"), (2L, "brand new widget"))
      .toDF("p_partkey", "p_name")
    val standing = Dedup.nameVocabOf(catalog)
    val canon = Dedup.canonMapOf(spark, standing)
    StreamingEntityCanon.writeBatch(batch, 3L, standing, canon, out)
    val known1 = StreamingEntityCanon.readSink(spark, s"$out/known")
      .select($"p_name", $"canon_name").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val fresh1 = StreamingEntityCanon.readSink(spark, s"$out/fresh")
      .select("p_name").as[String].collect().sorted.toSeq
    StreamingEntityCanon.writeBatch(batch, 3L, standing, canon, out)
    val known2 = StreamingEntityCanon.readSink(spark, s"$out/known")
      .select($"p_name", $"canon_name").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val fresh2 = StreamingEntityCanon.readSink(spark, s"$out/fresh")
      .select("p_name").as[String].collect().sorted.toSeq
    assert(known1 == Seq(("redd gear", "hot gear")),
      s"bridge resolves to the cluster canon: $known1")
    assert(fresh1 == Seq("brand new widget"))
    assert(known2 == known1 && fresh2 == fresh1,
      "replayed batch must overwrite, not append")
  }
}
