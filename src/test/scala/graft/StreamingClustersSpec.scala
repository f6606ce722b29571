package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.queries.Dedup
import graft.sources.Versioned
import graft.streaming.StreamingClusters

/** Streaming cluster maintenance ≡ batch: the version-chained
  * transitive closure must land on exactly the full recompute across
  * real micro-batch boundaries — including the bridge case, where a
  * later batch merges clusters formed from earlier ones — and a
  * crash-replayed batch must re-ensure its version, never
  * double-publish. */
class StreamingClustersSpec extends SparkSpec {
  import spark.implicits._

  // The deterministic bridge fixture (same seed-0 construction as
  // DedupSpec's q119 merge test): A≈B and C≈D over disjoint
  // vocabularies, E = A ++ C at est exactly 0.5 to both sides.
  private lazy val (a, b, c, d, e) = {
    val vocabA = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val vocabB = Vector("red", "blue", "green", "amber", "violet",
      "cyan", "teal", "coral", "olive", "plum")
    val rnd = new scala.util.Random(0)
    val ta = (0 until 60).map(_ => vocabA(rnd.nextInt(10))).mkString(" ")
    val tc = (0 until 60).map(_ => vocabB(rnd.nextInt(10))).mkString(" ")
    val tb = { val w = ta.split(" "); w(10) = "CHANGEDX"; w.mkString(" ") }
    val td = { val w = tc.split(" "); w(10) = "CHANGEDY"; w.mkString(" ") }
    (ta, tb, tc, td, ta + " " + tc)
  }

  test("multi-batch streamed ingest lands on the full-recompute clustering") {
    val in = Files.createTempDirectory("graft-scc-in").toString + "/docs"
    val lake = Files.createTempDirectory("graft-scc-lake").toString + "/lake"
    val ck = Files.createTempDirectory("graft-scc-ck").toString
    val docs = Seq(1L -> a, 2L -> b, 3L -> c, 4L -> d, 10L -> e)
      .toDF("doc_id", "text")
    docs.repartition(3).write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingClusters.start(spark, in, lake, ck, schema,
      maxFilesPerTrigger = 1)
    try q.awaitTermination(180000) finally q.stop()

    // genuinely multi-version — otherwise the maintenance merge is
    // vacuous and this spec proves nothing
    assert(Versioned.listVersions(spark, lake).size >= 2,
      "expected a multi-version ingest")

    val got = StreamingClusters.currentAssignment(spark, lake).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: the from-scratch closure over the final corpus
    val pairs = Dedup.candidatePairsFrom(Dedup.minhashSignatures(docs))
      .select($"doc_a".as("src"), $"doc_b".as("dst"))
    val full = graft.operators.ConnectedComponents
      .run(spark, docs.select($"doc_id".as("id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full, s"streamed chain diverged: $got vs $full")
    // and the fixture exercised the interesting physics: whatever
    // batch order the files arrived in, once E is in, everything is
    // ONE cluster — batches that arrived before E formed clusters
    // that E's batch had to merge (or E seeded the cluster its
    // successors joined); either way the star-contraction carried it
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 1L),
      s"expected one merged cluster: $got")
  }

  test("a crash-replayed ingest batch re-ensures its version, never double-publishes") {
    val lake = Files.createTempDirectory("graft-scc-replay").toString + "/lake"
    val b0 = Seq(1L -> a, 2L -> b).toDF("doc_id", "text")
    StreamingClusters.ingestBatch(spark, b0, 0L, lake)
    val v1 = Versioned.currentVersion(spark, lake)
    assert(v1.contains(1L))
    // replay of the SAME batch id (crash between publish and
    // checkpoint commit): version history must not advance
    StreamingClusters.ingestBatch(spark, b0, 0L, lake)
    assert(Versioned.currentVersion(spark, lake) == v1,
      "replayed batch must not publish a new version")
    // a DIFFERENT batch does advance, and the chain stays correct:
    // the near-dup pair stays one cluster, the stranger is a singleton
    val b1 = Seq(3L -> c).toDF("doc_id", "text")
    StreamingClusters.ingestBatch(spark, b1, 1L, lake)
    assert(Versioned.currentVersion(spark, lake).contains(2L))
    val asg = StreamingClusters.currentAssignment(spark, lake).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), s"unexpected: $asg")

    // INTERLOPER replay: batch 1's checkpoint commit is lost, and a
    // foreign publisher commits a version BEFORE the stream restarts.
    // The cumulative marker table must still recognize batch 1 — a
    // current-version-only marker would miss it behind the interloper
    // and ingest batch 1's documents twice
    val interloperDocs = Versioned.read(spark, lake, "documents")
      .unionByName(Seq(9L -> "stranger text").toDF("doc_id", "text"))
    Versioned.publish(spark, lake, Seq(
      Versioned.TableSpec("documents", interloperDocs),
      Versioned.TableSpec("documents_delta",
        Seq(9L -> "stranger text").toDF("doc_id", "text")),
      Versioned.TableSpec("batch_marker",
        Versioned.read(spark, lake, "batch_marker"))))
    val vAfterInterloper = Versioned.currentVersion(spark, lake)
    StreamingClusters.ingestBatch(spark, b1, 1L, lake) // the lost replay
    assert(Versioned.currentVersion(spark, lake) == vAfterInterloper,
      "replay behind an interloper version must not re-publish")
    val docs = Versioned.read(spark, lake, "documents")
      .groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(docs == 0, "replay behind an interloper duplicated documents")

    // NON-CARRYING interloper: a foreign publisher that does NOT list
    // batch_marker (Versioned.publish drops unlisted tables). The
    // stream must probe BACKWARD to the newest surviving version that
    // carries a marker table rather than treat itself as marker-less —
    // the r15 gap: a replay behind such a version double-ingested
    val noCarry = Versioned.read(spark, lake, "documents")
      .unionByName(Seq(10L -> "second stranger").toDF("doc_id", "text"))
    Versioned.publish(spark, lake, Seq(
      Versioned.TableSpec("documents", noCarry),
      Versioned.TableSpec("documents_delta",
        Seq(10L -> "second stranger").toDF("doc_id", "text"))))
    val vAfterNoCarry = Versioned.currentVersion(spark, lake)
    assert(!Versioned.tableExists(spark, lake, "batch_marker",
      vAfterNoCarry.get), "precondition: interloper dropped the marker")
    StreamingClusters.ingestBatch(spark, b1, 1L, lake) // the lost replay
    assert(Versioned.currentVersion(spark, lake) == vAfterNoCarry,
      "replay behind a non-carrying interloper must not re-publish")
    val docs2 = Versioned.read(spark, lake, "documents")
      .groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(docs2 == 0,
      "replay behind a non-carrying interloper duplicated documents")
  }
}
