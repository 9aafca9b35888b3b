package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Second-moment (Gram) aggregator for PCA/covariance over an
  * embedding column: folds each vector into ONE flat buffer holding
  * `[n, Σx (d), upper-triangular Σxxᵀ (d(d+1)/2)]` — for d = 64 that is
  * 2,145 doubles per partition, map-side combined, so the full pass
  * ships |partitions| buffers to the driver regardless of corpus size
  * (the sufficient-statistics shape every distributed PCA uses; cf.
  * Spark MLlib's RowMatrix.computeGramianMatrix, which reduces the same
  * triangular fold). Double accumulation makes the result deterministic
  * only up to partition merge order — callers pin invariants with
  * tolerances, not bits (the verb is rows-only by design).
  */
class GramAggregator(d: Int)
    extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Double] = new Array[Double](len)

  override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
    b(0) += 1.0
    var i = 0
    var t = 1 + d
    while (i < d) {
      val xi = x(i)
      b(1 + i) += xi
      var j = i
      while (j < d) {
        b(t) += xi * x(j)
        t += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Double]): Array[Double] = r

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

/** Driver-side dense symmetric eigensolver for the d×d covariance a
  * [[GramAggregator]] pass produces: CYCLIC Jacobi (Golub & Van Loan
  * §8.5) with a fixed sweep budget and fixed (p,q) visit order — fully
  * deterministic for a given input matrix, no pivot search, no
  * data-dependent iteration count. d is the EMBEDDING dimension (64
  * here), so the driver cost is microseconds and independent of corpus
  * size.
  */
object JacobiEigen {
  /** Returns (eigenvalues desc, eigenvectors as rows, sign-canonical:
    * each vector's largest-|component| entry is positive).
    */
  def apply(sym: Array[Array[Double]], sweeps: Int = 16)
      : (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = sym.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until d - 1; q <- p + 1 until d) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var k = 0
        while (k < d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // sign canon: the largest-|component| entry points positive (ties
      // resolve to the first index — deterministic)
      var best = 0
      var bi = 1
      while (bi < d) {
        if (math.abs(col(bi)) > math.abs(col(best))) best = bi
        bi += 1
      }
      if (col(best) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }
}
