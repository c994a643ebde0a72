package graft.etl

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via `flatMapGroupsWithState` — the
  * streaming-native form of the reference's effectively-once contract:
  * instead of merging duplicates into a snapshot after the fact
  * (MergeWriter), the stream itself suppresses keys it has already
  * seen, keeping only first occurrences.
  *
  * State is O(seen keys) per partition; a production deployment bounds
  * it with state TTL (`GroupStateTimeout`) once the source's replay
  * horizon is known.
  */
object Stateful {

  final case class Seen(count: Long)

  /** Emit only the first occurrence of each key; subsequent occurrences
    * update a count in state and emit nothing.
    *
    * `first` picks the surviving row when a key repeats WITHIN one
    * micro-batch — the iterator order there is post-shuffle, so without
    * a caller-defined reduction the survivor would be arbitrary
    * (violating the engine's determinism contract). One pass, no
    * group materialization. */
  def dedupFirstSeen[T](ds: Dataset[T], key: T => String,
      first: (T, T) => T)(implicit e: Encoder[T]): Dataset[T] = {
    implicit val seenEnc: Encoder[Seen] = Encoders.product[Seen]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(key)
      .flatMapGroupsWithState[Seen, T](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[T], state: GroupState[Seen]) =>
          var count = 0L
          var pick: Option[T] = None
          rows.foreach { r =>
            count += 1
            pick = Some(pick.fold(r)(first(_, r)))
          }
          val prior = state.getOption.map(_.count).getOrElse(0L)
          state.update(Seen(prior + count))
          if (prior == 0L) pick.iterator else Iterator.empty
      }
  }
}
