package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass exact-integer Gramian: folds the outer product qe·qeᵀ of every
  * row into a single row-major d² Long buffer — the treeAggregate shape of
  * `RowMatrix.computeGramianMatrix`, kept in exact integer arithmetic so the
  * DuckDB oracle can replay it bit-for-bit.
  *
  * Scale design: the corpus never materializes per-(i,j) rows. Each task
  * keeps ONE d² array and does d² multiply-adds per vector in a tight
  * primitive loop; the shuffle carries exactly one d² array per map task
  * regardless of corpus size. (The declarative double-posexplode form this
  * replaces generated n·d² intermediate rows — 2.6B at the 128× probe — and
  * copied the full vector array into each of the n·d first-level rows.)
  *
  * The zero buffer is the empty array: d is unknown until the first input,
  * so `reduce` sizes the buffer lazily and `merge` treats empty as identity.
  */
object GramAggregator extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  def zero: Array[Long] = Array.empty

  def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
    val d = a.length
    val buf = if (b.length == d * d) b else new Array[Long](d * d)
    var i = 0
    while (i < d) {
      val qi = a(i)
      val off = i * d
      var j = 0
      while (j < d) { buf(off + j) += qi * a(j); j += 1 }
      i += 1
    }
    buf
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
