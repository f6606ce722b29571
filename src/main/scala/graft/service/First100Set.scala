package graft.service

/** The reference's First100Set missing-number service (SURVEY §2.9;
  * api/first100.py:6-48): mutable state over the domain 1..100,
  * validated extraction, missing-number recovery by identity or Gauss
  * sum. Pure Scala — 100 ints never need a cluster; the relational
  * twin (`spark.range` + anti-join/sum) is q12 and First100Relational.
  */
final class First100Set {
  import First100Set._

  private var extractedSet: Set[Int] = Set.empty
  private var remainingSet: Set[Int] = (1 to Domain).toSet

  def extracted: Set[Int] = extractedSet
  def remaining: Set[Int] = remainingSet

  /** Validated extract (api/first100.py:16-29): range check and
    * no-repeat check; moves n between the two sets. */
  def extract(n: Int): Either[String, Int] = synchronized {
    if (n < 1 || n > Domain) Left(s"El número debe estar entre 1 y $Domain")
    else if (extractedSet.contains(n)) Left(s"El número $n ya fue extraído")
    else {
      extractedSet += n
      remainingSet -= n
      Right(n)
    }
  }

  /** Missing by identity (api/first100.py:31-38). */
  def missingByIdentity: Either[String, Int] = synchronized {
    if (extractedSet.size != 1)
      Left("Debe haber exactamente un número extraído")
    else Right(extractedSet.head)
  }

  /** Missing by Gauss sum (api/first100.py:40-48):
    * expected n(n+1)/2 minus the sum of what remains. */
  def missingBySum: Either[String, Int] = synchronized {
    if (extractedSet.size != 1)
      Left("Debe haber exactamente un número extraído")
    else Right(GaussTotal - remainingSet.sum)
  }
}

object First100Set {
  val Domain = 100
  val GaussTotal: Int = Domain * (Domain + 1) / 2 // 5050
}

/** Relational twin of the service used for engine-level tests: the
  * domain is a Dataset, extraction is an anti-join, recovery is the
  * aggregate — the same algebra the big tables use (SURVEY M1–M4). */
object First100Relational {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def missing(spark: SparkSession, extracted: Seq[Int]): DataFrame = {
    import spark.implicits._
    val domain = spark.range(1, First100Set.Domain + 1).toDF("n")
    val ex = extracted.map(_.toLong).toDF("n")
    domain.join(ex, Seq("n"), "left_anti")
      .agg((lit(First100Set.GaussTotal.toLong) - sum(col("n"))).as("missing"))
  }
}
