package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** stochasticLinearRegression / stochasticLogisticRegression analogs
  * (reference src/AggregateFunctions/AggregateFunctionMLMethod.h).
  *
  * The reference runs minibatch SGD per block and AVERAGES models on
  * merge — the result depends on row/block order, which a distributed
  * engine cannot reproduce deterministically. Here the model state is
  * built from order-independent sufficient statistics instead:
  *
  *  - linear: the exact least-squares solution of the normal equations
  *    (X~'X~) w = X~'y with X~ = [x, 1] — what SGD converges to;
  *  - logistic: one Newton step from w = 0, where the Hessian is
  *    X~'X~/4 and the gradient X~'(y - 0.5), i.e. the normal-equations
  *    solve of (X~'X~) w = X~' (4 (y - 0.5)) — deterministic and
  *    merge-able where iterative IRLS would not be.
  *
  * Input rows arrive as array(y, x1 … xk); the state is
  * [tag, w1 … wk, intercept] with tag 0 = linear, 1 = logistic, the
  * shape evalMLMethod consumes. Moments are plain sums, so partial
  * aggregation and AQE merges stay exact for integral-valued inputs.
  * For k <= 2 the solve is Cramer's rule in a fixed operation order
  * (bit-reproducible against the DuckDB oracle); larger k uses
  * Gaussian elimination with partial pivoting. */
class MlRegressionAggregator(logistic: Boolean)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  // buffer layout: [k, n, b_0..b_k, A_00, A_01, ..., A_kk] where the
  // augmented feature vector is (x1..xk, 1) and A is (k+1)x(k+1)
  def zero: Array[Double] = Array.empty

  private def init(k: Int): Array[Double] = {
    val d = k + 1
    val buf = new Array[Double](2 + d + d * d)
    buf(0) = k
    buf
  }

  def reduce(b0: Array[Double], row: Seq[Double]): Array[Double] = {
    val k = row.length - 1
    val b = if (b0.isEmpty) init(k) else b0
    require(b(0).toInt == k, "inconsistent feature count")
    val d = k + 1
    val t0 = row.head
    val t = if (logistic) 4.0 * (t0 - 0.5) else t0
    val x = new Array[Double](d)
    var i = 0
    while (i < k) { x(i) = row(i + 1); i += 1 }
    x(k) = 1.0
    b(1) += 1
    i = 0
    while (i < d) {
      b(2 + i) += x(i) * t
      var j = 0
      while (j < d) { b(2 + d + i * d + j) += x(i) * x(j); j += 1 }
      i += 1
    }
    b
  }

  def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a(0) == b(0), "inconsistent feature count")
      val out = a.clone()
      var i = 1
      while (i < out.length) { out(i) += b(i); i += 1 }
      out
    }

  def finish(b: Array[Double]): Seq[Double] = {
    if (b.isEmpty) return Seq.empty
    val k = b(0).toInt
    val d = k + 1
    val rhs = java.util.Arrays.copyOfRange(b, 2, 2 + d)
    val a = Array.tabulate(d, d)((i, j) => b(2 + d + i * d + j))
    val w: Array[Double] =
      if (d == 2) {
        // Cramer, fixed operation order (mirrors the SQL oracle)
        val det = a(0)(0) * a(1)(1) - a(0)(1) * a(1)(0)
        Array((rhs(0) * a(1)(1) - a(0)(1) * rhs(1)) / det,
              (a(0)(0) * rhs(1) - rhs(0) * a(1)(0)) / det)
      } else if (d == 3) {
        def det3(m: Array[Array[Double]]): Double =
          m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
            m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
            m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
        val det = det3(a)
        Array.tabulate(3) { col =>
          val m = Array.tabulate(3, 3)((i, j) => if (j == col) rhs(i) else a(i)(j))
          det3(m) / det
        }
      } else {
        // Gaussian elimination with partial pivoting
        val m = Array.tabulate(d)(i => a(i) :+ rhs(i))
        for (c <- 0 until d) {
          var p = c
          for (r <- c + 1 until d) if (math.abs(m(r)(c)) > math.abs(m(p)(c))) p = r
          val tmp = m(c); m(c) = m(p); m(p) = tmp
          for (r <- c + 1 until d) {
            val f = m(r)(c) / m(c)(c)
            for (j <- c to d) m(r)(j) -= f * m(c)(j)
          }
        }
        val w = new Array[Double](d)
        for (r <- d - 1 to 0 by -1) {
          var s = m(r)(d)
          for (j <- r + 1 until d) s -= m(r)(j) * w(j)
          w(r) = s / m(r)(r)
        }
        w
      }
    (if (logistic) 1.0 else 0.0) +: w.toSeq
  }

  def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
