package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.BpeApply

/** [[graft.functions.BpeApply]] — the single-expression BPE merge
  * application (r17, replacing the one-`replace`-node-per-merge fold
  * whose plan grew linearly in vocabulary size). Pins: (1) value
  * equivalence against the fold-of-`replace` formulation it replaced,
  * on generated corpora through the real codegen path; (2) plan size
  * flat in merge count; (3) whole-stage codegen still engaged at a
  * synthetic 8192-merge vocabulary; (4) null/edge behavior. */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def spaced(w: String): String =
    w.map(_.toString).mkString(" ", "  ", " ")

  test("expression ≡ the fold-of-replace formulation on random corpora") {
    // alphabet spans 1-byte ASCII, 2-byte Latin, 3-byte CJK and a
    // 4-byte supplementary-plane codepoint: the kernel replaces via
    // java.lang.String (UTF-16 code units) while Spark's `replace`
    // works on UTF8String bytes — equal results for well-formed text,
    // which this pins across every encoding width
    val chars = Seq("a", "b", "é", "漢", "😀")
    // words as SYMBOL LISTS (😀 is a surrogate pair — splitting a
    // String by chars would tear it), spaced-encoded directly
    val wordGen = Gen.choose(1, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(chars))
        .map(_.mkString(" ", "  ", " ")))
    val mergeGen = for {
      k <- Gen.choose(0, 12)
      syms = chars ++ Seq("ab", "aé", "é漢", "漢😀", "ba")
      ms <- Gen.listOfN(k, Gen.zip(Gen.oneOf(syms), Gen.oneOf(syms)))
    } yield ms
    val caseGen = Gen.zip(Gen.listOfN(40, wordGen), mergeGen)
    samples(caseGen, 12).zipWithIndex.foreach { case ((words, merges), i) =>
      val d = words.toDF("s")
      val got = d.withColumn("s", BpeApply.applyBpe(col("s"), merges))
        .collect().map(_.getString(0)).toSeq
      // the r16 formulation this expression must reproduce exactly
      val want = merges.foldLeft(d) { case (acc, (l, r)) =>
        acc.withColumn("s", replace(col("s"), lit(s" $l  $r "), lit(s" $l$r ")))
      }.collect().map(_.getString(0)).toSeq
      assert(got == want, s"case $i diverged (merges=$merges)")
    }
  }

  test("plan size is flat in the merge count") {
    val d = Seq(spaced("abcd")).toDF("s")
    def planChars(n: Int): Int = {
      val merges = (0 until n).map(i => (s"x$i", s"y$i"))
      d.withColumn("s", BpeApply.applyBpe(col("s"), merges))
        .queryExecution.optimizedPlan.treeString.length
    }
    val small = planChars(8)
    val large = planChars(8192)
    assert(large <= small + 64, // the count renders in the plan string
      s"plan grew with vocabulary: $small chars at 8 merges, $large at 8192")
  }

  test("whole-stage codegen stays engaged at an 8192-merge vocabulary") {
    val merges = (0 until 8192).map(i => (s"x$i", s"y$i")) :+ ("a" -> "b")
    // a range source, not a local relation — ConvertToLocalRelation
    // would fold the projection away and prove nothing about codegen
    val d = spark.range(2)
      .select(when(col("id") === 0, lit(spaced("aab")))
        .otherwise(lit(spaced("ba"))).as("s"))
      .withColumn("s", BpeApply.applyBpe(col("s"), merges))
    val exec = d.queryExecution.executedPlan
    val codegenSpans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"interpreted fallback at 8192 merges:\n$exec")
    // the bpe_apply projection sits INSIDE a codegen span, not under a
    // fallback Project
    assert(codegenSpans.exists(_.toString.contains("bpe_apply")),
      s"bpe_apply outside every codegen span:\n$exec")
    // and the late real merge still fires after 8192 no-ops:
    // 'aab' → (a,b) fuses the 2nd/3rd symbols; 'ba' has no (a,b) pair
    assert(d.collect().map(_.getString(0)).toSet ==
      Set(" a  ab ", " b  a "))
  }

  test("null input, empty merges, empty string") {
    val d = Seq(Some(spaced("ab")), None).toDF("s")
    val out = d.withColumn("s", BpeApply.applyBpe(col("s"), Nil))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some(" a  b "), None))
    val e = Seq("").toDF("s")
      .withColumn("s", BpeApply.applyBpe(col("s"), Seq("a" -> "b")))
      .collect().map(_.getString(0))
    assert(e.toSeq == Seq(""))
  }

  test("merges apply in learned order, leftmost non-overlapping") {
    // (a,b) then (ab,c): 'abc' → 'ab c' → 'abc' fused only if order held
    val d = Seq(spaced("abc")).toDF("s")
    val out = d.withColumn("s",
        BpeApply.applyBpe(col("s"), Seq("a" -> "b", "ab" -> "c")))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq(" abc "))
    // reversed order: (ab,c) can't fire before (a,b) creates 'ab'
    val out2 = d.withColumn("s",
        BpeApply.applyBpe(col("s"), Seq("ab" -> "c", "a" -> "b")))
      .collect().map(_.getString(0))
    assert(out2.toSeq == Seq(" ab  c "))
    // non-overlapping: 'aaa' under (a,a) → 'aa a', not 'aa aa'
    val out3 = Seq(spaced("aaa")).toDF("s")
      .withColumn("s", BpeApply.applyBpe(col("s"), Seq("a" -> "a")))
      .collect().map(_.getString(0))
    assert(out3.toSeq == Seq(" aa  a "))
  }
}
