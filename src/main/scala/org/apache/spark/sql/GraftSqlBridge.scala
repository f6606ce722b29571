package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4
  * moved them behind `classic.ExpressionUtils`). Standard extension
  * idiom: the only file living in Spark's package namespace. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Ids of the persisted RDDs a (local)checkpointed frame wraps — the
    * exact blocks `Dataset.localCheckpoint()` registered, so a caller
    * can unpersist precisely what IT created instead of diffing the
    * context-global persistent-RDD registry (which races with
    * concurrent requests whose in-flight checkpoints the diff would
    * evict — ADVICE r20 medium). */
  def checkpointedRddIds(df: Dataset[_]): Seq[Int] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }
}
