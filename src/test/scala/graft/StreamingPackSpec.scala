package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.queries.TextOps
import graft.sources.Versioned
import graft.sources.Versioned.TableSpec
import graft.streaming.StreamingPack
import graft.streaming.StreamingPack.{PackDoc, PackState, PackedSeq}

/** Streaming fixed-length packing (r20). Pins: (1) the stateful fold
  * is VALUE-EQUIVALENT to batch q161 over the same corpus — every
  * completed sequence hash-identical (all six columns), and the
  * in-flight tail left in state identical to q161's honest-length
  * final sequence — driven deterministically through TestGroupState
  * across simulated micro-batches; (2) a real multi-batch file stream
  * lands ⌊stream/L⌋ exactly-L sequences per source in the versioned
  * lake through the streamed-append discipline; (3) a re-run over the
  * same checkpoint publishes nothing (replay idempotence). */
class StreamingPackSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def freshState(prev: Option[PackState]) =
    org.apache.spark.sql.streaming.TestGroupState.create[PackState](
      optionalState = prev.map(org.apache.spark.api.java.Optional.of[PackState])
        .getOrElse(org.apache.spark.api.java.Optional.empty[PackState]()),
      timeoutConf = GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)

  test("stream-emitted sequences ≡ batch q161; state tail ≡ q161's final sequence") {
    val L = 64
    val merges = TextOps.bpeLearn(spark, dir).map { case (l, r, _) => (l, r) }
    // the corpus in arrival order (doc_id), cut into 5 micro-batches
    val encoded = StreamingPack
      .encodeDocs(spark, Tables(spark, dir, "documents"), merges)
      .collect().sortBy(_.doc_id)
    assert(encoded.length > 10, "fixture corpus unexpectedly small")
    val chunks = encoded.grouped(encoded.length / 5 + 1).toSeq
    assert(chunks.length >= 4, "need genuinely multi-batch execution")
    var st = Map.empty[String, PackState]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[PackedSeq]
    chunks.foreach { chunk =>
      chunk.groupBy(_.source).toSeq.sortBy(_._1).foreach { case (src, ds) =>
        val gs = freshState(st.get(src))
        emitted ++= StreamingPack.packDocs(L)(src, ds.iterator, gs)
        st += src -> gs.get
      }
    }
    val batch = TextOps.q161PackFixed(spark, dir, seqLen = L).collect()
    val want = batch.filter(_.getLong(3) == L).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).sortBy(t => (t._1, t._2)).toSeq
    val got = emitted.map(p =>
      (p.source, p.seq, p.n_docs, p.n_ids, p.ids_csv, p.bounds_csv))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want,
      s"stream ≠ batch: ${got.diff(want).take(2)} vs ${want.diff(got).take(2)}")
    // the tail in state IS q161's final sequence (or empty when the
    // stream length divides L and the final sequence was emitted)
    batch.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val last = rows.maxBy(_.getLong(1))
      val s = st(src)
      if (last.getLong(3) < L) {
        assert(s.seq == last.getLong(1), s"$src: tail seq index drifted")
        assert(s.tail.mkString(",") == last.getString(4),
          s"$src: in-flight tail ≠ q161's final sequence")
        assert(s.bounds.mkString(",") == last.getString(5),
          s"$src: tail bounds diverged")
      } else {
        assert(s.tail.isEmpty && s.seq == last.getLong(1) + 1,
          s"$src: a full final sequence must have been emitted")
      }
    }
  }

  test("zero-token documents pass through the packer without a stray EOS") {
    val gs = freshState(None)
    val out = StreamingPack.packDocs(4)("s", Iterator(
      PackDoc(1L, "s", Array(7L, 8L, 9L)), // +EOS fills seq 0 exactly
      PackDoc(2L, "s", Array.empty[Long]), // zero-token: contributes nothing
      PackDoc(3L, "s", Array(5L))), gs).toSeq
    assert(out.map(_.ids_csv) == Seq(s"7,8,9,${TextOps.EosId}"))
    assert(out.head.bounds_csv == "0" && out.head.n_docs == 1L)
    val s = gs.get
    assert(s.tail.toSeq == Seq(5L, TextOps.EosId) && s.bounds.toSeq == Seq(0L),
      s"tail must hold only doc 3's segment: ${s.tail.toSeq}")
  }

  test("a real multi-batch stream lands ⌊stream/L⌋ full sequences; replay publishes nothing") {
    val L = 32
    val in = Files.createTempDirectory("graft-spack-in").toString + "/docs"
    val lake = Files.createTempDirectory("graft-spack-lake").toString + "/lake"
    val ck = Files.createTempDirectory("graft-spack-ck").toString
    // bootstrap: an empty sequences table (the stream is the producer)
    Versioned.publish(spark, lake, Seq(TableSpec("seqs",
      spark.emptyDataset[PackedSeq].toDF())))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .repartition(3).write.parquet(in)
    val q = StreamingPack.start(spark, in, dir, lake, "seqs", ck,
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")).schema,
      seqLen = L, maxFilesPerTrigger = 1)
    q.awaitTermination()
    val cur = Versioned.currentVersion(spark, lake).get
    assert(cur > 1L, "stream published nothing")
    val out = Versioned.read(spark, lake, "seqs").collect()
    assert(out.nonEmpty)
    // arrival order differs from doc_id order across batches, but the
    // emission INVARIANT is order-free: per source, exactly
    // ⌊Σ(n_tokens+1) / L⌋ sequences, every one exactly L ids, seq ids
    // contiguous from 0, bounds strictly increasing inside [0, L)
    val merges = TextOps.bpeLearn(spark, dir).map { case (l, r, _) => (l, r) }
    val streamLen = StreamingPack
      .encodeDocs(spark, Tables(spark, dir, "documents"), merges)
      .collect().groupBy(_.source)
      .map { case (s, ds) => s -> ds.map(_.ids.length.toLong + 1).sum }
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.length.toLong == streamLen(src) / L,
        s"$src: ${rows.length} sequences, want ${streamLen(src) / L}")
      assert(rows.forall(_.getLong(3) == L.toLong))
      assert(rows.map(_.getLong(1)).sorted.toSeq ==
        (0L until rows.length.toLong))
      rows.foreach { r =>
        val bounds = r.getString(5).split(",").map(_.toLong).toSeq
        assert(bounds == bounds.sorted && bounds.distinct == bounds &&
          bounds.forall(b => b >= 0 && b < L), s"$src bad bounds: $bounds")
      }
    }
    // replay: a second run over the same checkpoint sees no new files
    // and publishes nothing
    val q2 = StreamingPack.start(spark, in, dir, lake, "seqs", ck,
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")).schema,
      seqLen = L, maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(Versioned.currentVersion(spark, lake).get == cur,
      "replay over the checkpoint must publish nothing")
  }
}
