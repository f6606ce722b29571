package graft

import graft.operators.Preview

class PreviewSpec extends SparkSpec {
  import spark.implicits._

  test("headTail returns first and last n in order without a full sort collect") {
    val df = (1L to 1000L).toDF("v")
    val got = Preview.headTail(df, "v", 5).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L, 996L, 997L, 998L, 999L, 1000L))
  }
}
