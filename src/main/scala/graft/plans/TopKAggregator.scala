package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregate (SURVEY §4.2's "exact streaming top-k"
  * candidate): keeps at most `k` `(score, key)` pairs per group in the
  * aggregation buffer, so a top-k-per-group query shuffles O(k · groups)
  * rows instead of sorting whole partitions the way a `row_number()`
  * window does. Ordering: score descending, key ascending on ties —
  * deterministic, matching the SQL-window oracle twin.
  *
  * Buffer is a plain sorted List (k is small — the reference caps search
  * k at 100); `reduce` inserts in O(k), `merge` merges in O(k).
  */
final case class ScoredKey(score: Double, key: Long)

final class TopKAggregator(k: Int)
    extends Aggregator[ScoredKey, List[ScoredKey], Seq[ScoredKey]] {
  require(k >= 1)

  private def lt(a: ScoredKey, b: ScoredKey): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  override def zero: List[ScoredKey] = Nil

  override def reduce(buf: List[ScoredKey], in: ScoredKey): List[ScoredKey] = {
    val (before, after) = buf.span(e => lt(e, in))
    (before ::: in :: after).take(k)
  }

  override def merge(a: List[ScoredKey], b: List[ScoredKey]): List[ScoredKey] = {
    @annotation.tailrec
    def go(x: List[ScoredKey], y: List[ScoredKey], acc: List[ScoredKey], n: Int): List[ScoredKey] =
      if (n == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil)         => acc.reverse
        case (xs, Nil)          => acc.reverse ::: xs.take(n)
        case (Nil, ys)          => acc.reverse ::: ys.take(n)
        case (xh :: xt, yh :: _) if lt(xh, yh) => go(xt, y, xh :: acc, n - 1)
        case (_, yh :: yt)      => go(x, yt, yh :: acc, n - 1)
      }
    go(a, b, Nil, k)
  }

  override def finish(buf: List[ScoredKey]): Seq[ScoredKey] = buf

  // the buffer is tiny (<= k entries) — kryo keeps it simple
  override def bufferEncoder: Encoder[List[ScoredKey]] =
    Encoders.kryo[List[ScoredKey]]

  override def outputEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
}
