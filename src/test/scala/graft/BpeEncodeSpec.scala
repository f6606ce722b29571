package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.BpeEncode
import graft.queries.TextOps

/** [[graft.functions.BpeEncode]] — corpus-scale token-ID encoding
  * (r19). Pins: (1) ids ≡ [[TextOps.tokenizeWord]]'s driver-side
  * serving fold on generated documents and merge tables through the
  * real codegen path — the seam that guarantees `POST /tokenize` and
  * the training shards can never disagree; (2) the same equivalence
  * against the CORPUS-learned model on real sf0.001 documents via
  * [[TextOps.tokenizeText]]; (3) plan size flat in merge count;
  * (4) whole-stage codegen engaged at a synthetic 8192-merge
  * vocabulary; (5) null/empty/whitespace edge behavior. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Driver-side reference: tokenizeWord per whitespace token, ids
    * flattened — exactly what the expression must emit per document. */
  private def referenceIds(merges: Seq[(String, String)], text: String)
      : Seq[Long] = {
    val (pats, reps, idOf) =
      TextOps.tokenizeKitOf(merges.map { case (l, r) => (l, r, 0L) })
    text.split("\\s+").filter(_.nonEmpty).toSeq
      .flatMap(w => TextOps.tokenizeWord(pats, reps, idOf, w).ids)
  }

  test("ids ≡ the driver-side serving fold on random docs and models") {
    // alphabet spans 1/2/3/4-byte codepoints (😀 is a surrogate pair —
    // the kernel iterates CODEPOINTS, which this pins)
    val chars = Seq("a", "b", "é", "漢", "😀")
    val wordGen = Gen.choose(1, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(chars)).map(_.mkString))
    val docGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val mergeGen = for {
      k <- Gen.choose(0, 12)
      syms = chars ++ Seq("ab", "aé", "é漢", "漢😀", "ba", "abb")
      ms <- Gen.listOfN(k, Gen.zip(Gen.oneOf(syms), Gen.oneOf(syms)))
    } yield ms
    val caseGen = Gen.zip(Gen.listOfN(20, docGen), mergeGen)
    samples(caseGen, 10).zipWithIndex.foreach { case ((texts, merges), i) =>
      val got = texts.toDF("text")
        .select(BpeEncode.encodeIds(col("text"), merges).as("ids"))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      val want = texts.map(referenceIds(merges, _))
      assert(got == want, s"case $i diverged (merges=$merges)")
    }
  }

  test("corpus-learned model: expression ≡ tokenizeText on sf0.001 docs") {
    val dir = "/root/testdata/sf0.001"
    val merges = TextOps.bpeLearn(spark, dir).map { case (l, r, _) => (l, r) }
    val sample = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(25)
    val got = sample
      .select(col("doc_id"), BpeEncode.encodeIds(col("text"), merges).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    sample.collect().foreach { r =>
      val (_, _, toks) = TextOps.tokenizeText(spark, dir, r.getString(1))
      assert(got(r.getLong(0)) == toks.flatMap(_.ids),
        s"doc ${r.getLong(0)} diverged from the serving path")
    }
  }

  test("plan size is flat in the merge count") {
    val d = Seq("ab cd").toDF("text")
    def planChars(n: Int): Int = {
      val merges = (0 until n).map(i => (s"x$i", s"y$i"))
      d.select(BpeEncode.encodeIds(col("text"), merges).as("ids"))
        .queryExecution.optimizedPlan.treeString.length
    }
    val small = planChars(8)
    val large = planChars(8192)
    assert(large <= small + 64,
      s"plan grew with vocabulary: $small chars at 8 merges, $large at 8192")
  }

  test("whole-stage codegen stays engaged at an 8192-merge vocabulary") {
    val merges = (0 until 8192).map(i => (s"x$i", s"y$i")) :+ ("a" -> "b")
    val d = spark.range(2)
      .select(when(col("id") === 0, lit("aab ba"))
        .otherwise(lit("ba")).as("text"))
      .select(BpeEncode.encodeIds(col("text"), merges).as("ids"))
    val exec = d.queryExecution.executedPlan
    val codegenSpans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"interpreted fallback at 8192 merges:\n$exec")
    assert(codegenSpans.exists(_.toString.contains("bpe_encode")),
      s"bpe_encode outside every codegen span:\n$exec")
    // 'aab' under late merge (a,b): symbols a,ab → ids 97, 0x110000+8192
    assert(d.collect().map(_.getSeq[Long](0).toSeq).toSet ==
      Set(Seq(97L, 0x110000L + 8192, 98L, 97L), Seq(98L, 97L)))
  }

  test("fixed-length packing: non-tail sequences exactly L, streams reassemble losslessly") {
    val dir = "/root/testdata/sf0.001"
    val L = 64
    val out = TextOps.q161PackFixed(spark, dir, seqLen = L).collect()
    // reference stream per source: each doc's ids (q159's grain) + EOS,
    // concatenated in doc_id order
    val idsByDoc = TextOps.q159TokenIds(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val srcOf = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val wantStream = srcOf.groupBy(_._2).map { case (src, ds) =>
      src -> ds.map(_._1).sorted
        .map(d => s"${idsByDoc(d)},${TextOps.EosId}").mkString(",")
    }
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length.toLong),
        s"$src: sequence ids not contiguous from 0")
      sorted.init.foreach(r => assert(r.getLong(3) == L.toLong,
        s"$src seq ${r.getLong(1)}: ${r.getLong(3)} ids — non-tail must be full"))
      assert(sorted.last.getLong(3) > 0 && sorted.last.getLong(3) <= L.toLong)
      assert(sorted.map(_.getString(4)).mkString(",") == wantStream(src),
        s"$src: reassembled stream diverged — splitting lost or reordered ids")
      // boundary offsets: one per contributing doc, strictly
      // increasing, inside the sequence
      sorted.foreach { r =>
        val bounds = r.getString(5).split(",").map(_.toLong).toSeq
        assert(bounds.length == r.getLong(2),
          s"$src seq ${r.getLong(1)}: ${bounds.length} bounds, " +
            s"${r.getLong(2)} docs")
        assert(bounds == bounds.sorted && bounds.distinct == bounds,
          s"$src seq ${r.getLong(1)}: bounds not strictly increasing: $bounds")
        assert(bounds.forall(b => b >= 0 && b < L),
          s"$src seq ${r.getLong(1)}: bound outside the sequence: $bounds")
      }
    }
  }

  test("empty and whitespace-only documents are outside the packing contract") {
    // advice-low, r19: the DuckDB oracles' docids CTE joins through
    // word positions and never sees a zero-token document, while the
    // Spark side used to emit it (n_tokens=0) and count its EOS into
    // q161's stream offsets — a latent divergence. The contract is now
    // pinned on BOTH sides: zero-token docs are out, and this fixture
    // is the corpus that exercises the edge.
    val dir = java.nio.file.Files.createTempDirectory("graft-emptydoc")
      .toString
    Seq(
      (1L, "a", "ab ab ba"),
      (2L, "a", ""), // zero tokens — must vanish from every grain
      (3L, "a", " \t  "), // whitespace-only — same
      (4L, "b", "ba ab ab ab"))
      .toDF("doc_id", "source", "text")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    val ids = TextOps.q159TokenIds(spark, dir).collect()
    assert(ids.map(_.getLong(0)).toSeq == Seq(1L, 4L),
      s"zero-token docs must be dropped: ${ids.mkString(", ")}")
    assert(ids.forall(_.getLong(1) > 0))
    // the packed streams account for EXACTLY the contentful docs:
    // per source, Σ sequence n_ids = Σ n_tokens + one EOS per doc —
    // an empty doc contributes neither ids nor a stray EOS offset
    val byDoc = ids.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = TextOps.q161PackFixed(spark, dir, seqLen = 4).collect()
    def streamIds(src: String): Long =
      packed.filter(_.getString(0) == src).map(_.getLong(3)).sum
    assert(streamIds("a") == byDoc(1L) + 1,
      s"source a stream carries ${streamIds("a")} ids, " +
        s"want ${byDoc(1L)} + 1 EOS")
    assert(streamIds("b") == byDoc(4L) + 1)
    // and the audit sees one contentful doc per source
    val stats = TextOps.q162PackStats(spark, dir, seqLen = 4).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(stats == Map("a" -> 1L, "b" -> 1L),
      s"q162 must count only contentful docs: $stats")
  }

  test("null, empty, whitespace-only, and id-scheme edges") {
    val d = Seq(Some("ab"), None, Some(""), Some("  \t ")).toDF("text")
    val out = d.select(BpeEncode.encodeIds(col("text"), Nil).as("ids"))
      .collect().map(r => Option(r.get(0)).map(_ => r.getSeq[Long](0).toSeq))
    assert(out.toSeq == Seq(
      Some(Seq(97L, 98L)), None, Some(Nil), Some(Nil)))
    // merged-symbol id keyed by the FIRST producing round: (a,b) twice
    // (via different paths) must reuse id 0x110000, and an astral
    // codepoint id is the codepoint, not a surrogate half
    val m = Seq("a" -> "b", "ab" -> "ab") // 'abab' → 'ab ab' → 'abab'
    val out2 = Seq("abab 😀").toDF("text")
      .select(BpeEncode.encodeIds(col("text"), m).as("ids"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(out2.toSeq == Seq(Seq(0x110000L + 1, 0x1F600L)))
  }

  test("the word→ids memo is shared per MODEL across table instances") {
    // two independently built tables under the same merges (the shape
    // q159–q162 + StreamingTokenize produce: one EncodeTable per plan)
    // must resolve ONE JVM-wide memo — the r19 advice-low fix: a memo
    // on the instance restarts empty per deserialized task
    val m = Seq("qq" -> "rr", "ss" -> "tt")
    val t1 = BpeEncode.EncodeTable.from(m)
    val t2 = BpeEncode.EncodeTable.from(m)
    assert(t1 ne t2)
    assert(t1.key == t2.key)
    assert(t1.memo eq t2.memo,
      "same model, different plans: the memo must be one shared map")
    // the task-binary path: a serialization round-trip (what an
    // executor task does to the plan's reference object) lands on the
    // same shared memo, not a fresh empty one
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(t1); oos.close()
    val t3 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[BpeEncode.EncodeTable]
    assert(t3.key == t1.key)
    assert(t3.memo eq t1.memo,
      "a deserialized table must share the model's memo")
    // a different model must not: the registry keys by content
    val other = BpeEncode.EncodeTable.from(Seq("qq" -> "zz"))
    assert(other.key != t1.key)
    assert(other.memo ne t1.memo)
    // the memo caches ids resolved through idOf, so a hand-built
    // table with t1's merges but a DEVIATING id map must not share
    // t1's memo either (the constructor is public; review, r20)
    val deviantIds = new java.util.HashMap[String, java.lang.Long]()
    t1.idOf.forEach((k, v) =>
      deviantIds.put(k, java.lang.Long.valueOf(v.longValue + 1)))
    val deviant = new BpeEncode.EncodeTable(t1.pats, t1.reps, deviantIds)
    assert(deviant.key != t1.key)
    assert(deviant.memo ne t1.memo,
      "same merges + different id map must not share a memo")
  }
}
