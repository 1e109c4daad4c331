package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k Aggregator, generic over the row payload: keeps the
  * best k elements under `better`, with map-side partial merge — the
  * buffer never exceeds k, so a billion-row group shuffles as k rows
  * per input partition per group. The sort-take merge is fine at the
  * single-digit k of most use sites; for larger k (the quota-sample
  * k=100) the per-row `reduce` short-circuits on a full buffer whose
  * worst kept element still beats the candidate — O(1) for every row
  * that can't make the cut, which at steady state is almost all of
  * them.
  *
  * The one implementation behind grouped top-k rows
  * (`Relational.topkPerGroup`), per-lang tf-idf terms
  * (`TextAnalysis.tfidfTopTerms`), per-probe neighbor ranking
  * (`similarity.Similarity`), and per-lang quota sampling
  * (`TextAnalysis.corpusBalanceSample`) — anywhere a window over a
  * low-cardinality partition key would funnel the whole table into a
  * handful of reducers. `better` must be a strict total order (ties
  * broken by a unique id) for deterministic, oracle-matching output. */
class BoundedTopK[T](k: Int, better: (T, T) => Boolean)(
    implicit enc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {
  def zero: Seq[T] = Vector.empty
  // buf stays sorted best-first (merge sorts; zero is empty), so
  // buf.last is the worst kept element and gates admission
  def reduce(buf: Seq[T], r: T): Seq[T] =
    if (buf.length == k && better(buf.last, r)) buf
    else merge(buf, Vector(r))
  def merge(x: Seq[T], y: Seq[T]): Seq[T] = (x ++ y).sortWith(better).take(k)
  def finish(buf: Seq[T]): Seq[T] = buf
  def bufferEncoder: Encoder[Seq[T]] = enc
  def outputEncoder: Encoder[Seq[T]] = enc
}
