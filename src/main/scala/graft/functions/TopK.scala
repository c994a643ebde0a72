package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Exact per-group top-k as a typed `Aggregator` (SURVEY §2.6): a
  * bounded buffer makes the partial-aggregate state O(k) instead of the
  * O(group) a window `row_number` materializes — at 100 TB this is the
  * difference between shuffling every row of a group to one reducer and
  * shuffling only k-row partials that merge associatively.
  *
  * Rows are (value, id1, id2) with a deterministic total order: value
  * DESC, then id1 ASC, id2 ASC — the same tie-break contract every
  * ranking query in this engine uses.
  */
object TopK {

  type Entry = (Double, Long, Int)

  /** total order: value desc, id1 asc, id2 asc */
  private def before(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  final class TopKAgg(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    override def zero: Seq[Entry] = Vector.empty

    override def reduce(buf: Seq[Entry], row: Entry): Seq[Entry] =
      if (buf.size < k) insert(buf, row)
      else if (before(row, buf.last)) insert(buf.dropRight(1), row)
      else buf

    private def insert(buf: Seq[Entry], row: Entry): Seq[Entry] = {
      val (hi, lo) = buf.span(before(_, row))
      (hi :+ row) ++ lo
    }

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = {
      // merge two sorted bounded buffers, keep k
      val out = Vector.newBuilder[Entry]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        if (j >= b.size || (i < a.size && before(a(i), b(j)))) {
          out += a(i); i += 1
        } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(r: Seq[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  def topK(k: Int): TopKAgg = new TopKAgg(k)
}
