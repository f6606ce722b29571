package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CoarseQuantizer

/** Unsupervised quantizer training: pure driver math, no Spark. */
class CoarseQuantizerSpec extends AnyFunSuite {

  // three well-separated direction clusters on the unit sphere (3D),
  // each with a little deterministic jitter
  private def clustered: Array[Array[Double]] = {
    val axes = Seq(
      Array(1.0, 0.05, 0.0), Array(0.0, 1.0, 0.05), Array(0.05, 0.0, 1.0))
    (0 until 30).map { i =>
      val a = axes(i % 3)
      val eps = 0.01 * ((i % 7) - 3)
      Array(a(0) + eps, a(1) - eps, a(2) + 2 * eps)
    }.toArray
  }

  test("recovers separated clusters: every point lands near its axis") {
    val cents = CoarseQuantizer.train(clustered, k = 3, iters = 10)
    assert(cents.length == 3)
    // unit centroids
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    // each of the three axes is captured by SOME distinct centroid
    val owners = Seq(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0)).map(a => CoarseQuantizer.assign(cents, a))
    assert(owners.distinct.length == 3, s"axes collapsed: $owners")
    // and every sample point agrees with its axis's centroid
    clustered.zipWithIndex.foreach { case (v, i) =>
      val unit = {
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
      assert(CoarseQuantizer.assign(cents, unit) == owners(i % 3),
        s"point $i strayed from its cluster")
    }
  }

  test("training is bit-deterministic") {
    val a = CoarseQuantizer.train(clustered, k = 4, iters = 10)
    val b = CoarseQuantizer.train(clustered, k = 4, iters = 10)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("degenerate inputs: k larger than distinct points; zero vectors") {
    val few = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val cents = CoarseQuantizer.train(few, k = 5, iters = 3)
    assert(cents.length == 2) // capped at sample size
    val withZero = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val c2 = CoarseQuantizer.train(withZero, k = 2, iters = 3)
    assert(c2.length == 2)
    c2.foreach(c => assert(c.forall(x => !x.isNaN)))
  }
}
