package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Notebook-style preview (SURVEY L1/U1 — `pd.concat((head, tail))`,
  * lectura_prueba_csv.ipynb cell a128ff9b): first and last n rows by a
  * given total order. `limit` is cheap (early-stop scan); the tail
  * comes from a reversed-order limit — never a full collect. */
object Preview {
  def headTail(df: DataFrame, orderCol: String, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions.col
    val head = df.orderBy(col(orderCol).asc).limit(n)
    val tail = df.orderBy(col(orderCol).desc).limit(n)
      .orderBy(col(orderCol).asc)
    head.unionByName(tail)
  }
}
