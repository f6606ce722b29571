package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism for CPU-heavy per-row kernels over
  * under-parallel scans — the "input skew" fix (one small or
  * unsplittable file ⇒ one scan task ⇒ a per-row kernel runs on one
  * core while the rest of the cluster idles). The local testdata is the
  * degenerate case: every table is ONE parquet file with ONE row group,
  * so every scan-stage kernel (codecs, BPE encode, tokenize/explode,
  * regex scoring) was serializing on a single task.
  *
  * [[byKey]] hash-repartitions across the session's default parallelism
  * ONLY when the frame's physical plan would run with fewer partitions.
  * On a real cluster the input already arrives in hundreds of splits,
  * the guard sees enough partitions, and NO exchange is added — the
  * knob is scale-adaptive, not tuned to local mode. When it does fire,
  * the shuffle moves the frame once (project to the needed columns
  * first — callers pass the narrow pre-kernel projection) and the
  * explicit numPartitions keeps AQE from coalescing the spread away.
  *
  * The key must be high-cardinality and deterministic (doc_id — never
  * rand(): re-run map tasks after a fetch failure would re-draw and
  * duplicate/lose rows, SPARK-38388).
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    // streaming frames can't be planned eagerly (.rdd throws) and
    // micro-batches are trigger-sized anyway — pass through untouched
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the frame but launches no job
    if (want <= 1 || df.rdd.getNumPartitions >= want) df
    else df.repartition(want, key)
  }
}
