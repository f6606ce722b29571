package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.queries.TextOps
import graft.functions.VectorOps._
import graft.functions.CentroidCodebook

/** Generator-driven invariants for the hot kernels — boundary shapes
  * (doc length ≡ 0/1 mod chunk size, sign mixes, near-parallel
  * vectors) that planted examples under-sample. Deterministic seeds:
  * a property failure must reproduce. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("chunk dedup roundtrips duplicate-free docs of every length shape") {
    // globally unique words ⇒ no chunk repeats ⇒ dedup must be identity
    val lens = samples(Gen.choose(1, 35), 80)
    val docs = lens.zipWithIndex.map { case (len, i) =>
      (i.toLong, (0 until len).map(j => s"w${i}_$j").mkString(" "))
    }
    val d = docs.toDF("doc_id", "text")
    val out = TextOps.reassemble(
        TextOps.firstOccurrence(TextOps.chunkify(d, 3)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == text,
        s"doc $id (len ${text.split(" ").length}) did not roundtrip")
    }
  }

  test("bloom probe never false-negatives any inserted string") {
    // the invariant q60's exactness rests on: every inserted member
    // probes true through the codegen expression path, for arbitrary
    // (incl. unicode and empty-ish) strings and tiny saturated filters
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)),
      Gen.listOfN(5, Gen.oneOf("é", "漢", " ", "a", "\t")).map(_.mkString),
      Gen.choose(0, 1000000).map(n => s"gram $n of corpus"))
    val sets = samples(Gen.nonEmptyListOf(strGen).map(_.distinct), 30)
    sets.zipWithIndex.foreach { case (members, i) =>
      // deliberately undersized capacity: saturation raises fpp but
      // must never produce a false negative
      val bf = org.apache.spark.util.sketch.BloomFilter.create(
        math.max(members.length / 2, 1).toLong, 0.03)
      members.foreach(m => bf.putBinary(m.getBytes("UTF-8")))
      val bc = spark.sparkContext.broadcast(bf)
      val missed = members.toDF("g")
        .select(col("g"),
          graft.functions.BloomProbe.mightContain(col("g"), bc).as("hit"))
        .filter(!col("hit")).collect()
      assert(missed.isEmpty,
        s"set $i: false negatives ${missed.map(_.getString(0)).toSeq}")
    }
  }

  test("fixed-point cosine stays within quantization error of double cosine") {
    val dim = 8
    val vecGen = Gen.listOfN(dim, Gen.choose(-10.0, 10.0))
      .suchThat(v => math.sqrt(v.map(x => x * x).sum) > 0.5)
    val pairs = samples(Gen.zip(vecGen, vecGen), 60)
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.map(_.toFloat), b.map(_.toFloat)) }
      .toDF("id", "a", "b")
      .withColumn("qa", vector_quantize(col("a")))
      .withColumn("qb", vector_quantize(col("b")))
      .withColumn("cos", cosineQ(dot_long(col("qa"), col("qb")),
        normQ(dot_long(col("qa"), col("qa"))),
        normQ(dot_long(col("qb"), col("qb")))))
    val got = df.select("id", "cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      // reference cosine over the FLOAT-rounded inputs (what Spark saw)
      val af = a.map(_.toFloat.toDouble)
      val bf = b.map(_.toFloat.toDouble)
      val exact = af.zip(bf).map { case (x, y) => x * y }.sum /
        (math.sqrt(af.map(x => x * x).sum) * math.sqrt(bf.map(x => x * x).sum))
      assert(math.abs(got(i.toLong) - exact) < 1e-4,
        s"pair $i: fixed-point ${got(i.toLong)} vs double $exact")
    }
  }

  test("argmax on a zero-norm vector yields highest label + NaN, not sentinels") {
    import spark.implicits._
    // a legal all-zero embedding makes every cosine NaN (0/0): the
    // kernel must fall back to the highest label (the tie-break
    // direction) instead of leaking its (-Inf, Long.MinValue) loop
    // sentinel as a phantom cell
    val cb = CentroidCodebook(
      Array(0L, 7L, 3L),
      Array(Array(1000000L, 0L), Array(0L, 1000000L),
        Array(700000L, 700000L)),
      Array(1.0, 1.0, 0.99))
    val out = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f))).toDF("id", "v")
      .withColumn("q6", vector_quantize(col("v")))
      .withColumn("nrm", normQ(dot_long(col("q6"), col("q6"))))
      .select(col("id"), argmax_cosine(col("q6"), col("nrm"), cb).as("best"))
      .select(col("id"), col("best.c_label"), col("best.sim")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 7L, s"zero vector must take the highest label: $out")
    assert(out(1L)._2.isNaN, "zero vector's sim must be NaN, not -Infinity")
    assert(out(2L)._1 == 0L, "a normal vector still picks its true argmax")
  }

  test("argmax expression agrees with the crossJoin+max(struct) formulation") {
    val dim = 8
    val vecGen = Gen.listOfN(dim, Gen.choose(-5.0, 5.0))
      .suchThat(v => math.sqrt(v.map(x => x * x).sum) > 0.5)
    val corpus = samples(vecGen, 50).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
    val cents = samples(vecGen, 6).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }

    val emb = corpus.toDF("vec_id", "embedding")
      .withColumn("q6", vector_quantize(col("embedding")))
      .withColumn("nrm", normQ(dot_long(col("q6"), col("q6"))))
    val centDf = cents.toDF("c_label", "centroid")
      .withColumn("c6", vector_quantize(col("centroid")))
      .withColumn("cnrm", normQ(dot_long(col("c6"), col("c6"))))
      .select("c_label", "c6", "cnrm")

    val cRows = centDf.orderBy("c_label").collect()
    val cb = CentroidCodebook(
      cRows.map(_.getLong(0)),
      cRows.map(_.getSeq[Long](1).toArray),
      cRows.map(_.getDouble(2)))
    val viaExpr = emb.select(col("vec_id"),
        argmax_cosine(col("q6"), col("nrm"), cb).as("best"))
      .select(col("vec_id"), col("best.sim"), col("best.c_label"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

    val viaJoin = emb.crossJoin(broadcast(centDf))
      .select(col("vec_id"),
        struct(cosineQ(dot_long(col("q6"), col("c6")), col("nrm"), col("cnrm"))
          .as("sim"), col("c_label")).as("sc"))
      .groupBy("vec_id").agg(max(col("sc")).as("best"))
      .select(col("vec_id"), col("best.sim"), col("best.c_label"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

    assert(viaExpr == viaJoin,
      "the map-side expression and the join formulation must agree exactly")
  }

  test("BPE replace-merge ≡ a reference index-scan BPE on random corpora") {
    // reference implementation: pair counts at INDEX level (overlaps
    // included — 'aaa' holds two (a,a) positions), argmax on
    // (count desc, l, r), merge = greedy leftmost non-overlapping
    // scan. The engine implements the same semantics through literal
    // string replace over the double-space encoding; the merge
    // SEQUENCE equality below pins both the counting and the replace
    // transitively, because every later round's counts depend on the
    // earlier merges having been applied identically.
    def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def refBpe(words: Seq[(String, Long)], rounds: Int)
        : Seq[(String, String, Long)] = {
      var state = words.map { case (w, n) => (w.map(_.toString).toVector, n) }
      var out = Vector.empty[(String, String, Long)]
      var done = false
      for (_ <- 1 to rounds if !done) {
        val counts = state.flatMap { case (syms, n) =>
          syms.zip(syms.drop(1)).map(p => p -> n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          out :+= ((l, r, c))
          state = state.map { case (syms, n) => (refMerge(syms, l, r), n) }
        }
      }
      out
    }
    val wordGen = Gen.choose(1, 6).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val caseGen = for {
      k <- Gen.choose(1, 8)
      ws <- Gen.listOfN(k, wordGen)
      ns <- Gen.listOfN(ws.distinct.length, Gen.choose(1, 5))
    } yield ws.distinct.zip(ns)
    samples(caseGen, 25).zipWithIndex.foreach { case (words, i) =>
      val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }
        .mkString(" ")
      val got = TextOps.bpeLearnOn(s"prop-bpe-$i",
        Seq((1L, text)).toDF("doc_id", "text"))
      val want = refBpe(words.map { case (w, n) => (w, n.toLong) },
        TextOps.BpeRounds)
      assert(got == want,
        s"case $i (${words.mkString(", ")}): engine $got vs reference $want")
    }
  }
}
