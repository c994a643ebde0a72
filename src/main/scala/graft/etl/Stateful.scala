package graft.etl

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via `flatMapGroupsWithState` — the
  * streaming-native form of the reference's effectively-once contract:
  * instead of merging duplicates into a snapshot after the fact
  * (MergeWriter), the stream itself suppresses keys it has already
  * seen, keeping only first occurrences.
  *
  * Two variants: [[dedupFirstSeen]] keeps state forever (exact dedup,
  * O(seen keys) state — fine for bounded key domains), and
  * [[dedupFirstSeenTtl]] bounds state to the keys seen within a TTL
  * horizon — the 100 TB-stream shape, where "duplicates" only arrive
  * within a known replay window and state must not grow with stream
  * lifetime.
  */
object Stateful {

  final case class Seen(count: Long)

  /** Emit only the first occurrence of each key; subsequent occurrences
    * update a count in state and emit nothing. State never expires.
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

  /** [[dedupFirstSeen]] with an EVENT-time TTL: a key whose last
    * sighting's event time is more than `ttlMs` behind the watermark
    * drops out of state, and a sighting after expiry is re-emitted.
    * State is bounded to the keys active within the horizon — the
    * 100 TB-stream contract: size the TTL beyond the source's replay
    * horizon and expiry can only forget keys whose duplicates can no
    * longer arrive (the watermark already bounds how late they may be).
    * The TTL slides: each sighting re-arms it from that row's event
    * time, so a hot key stays deduplicated while cold keys age out.
    *
    * Event-time (not processing-time) on purpose: replay horizons are
    * properties of the DATA, and event-time timeouts are deterministic
    * under replay — a restarted stream reaches the same expiry
    * decisions, where a wall-clock TTL would depend on when the
    * reprocessing ran. `ds` must carry a watermark on its event-time
    * column (`withWatermark`) before calling; Spark rejects the plan
    * loudly otherwise.
    *
    * @param eventTimeMs epoch-millis accessor for a row's event time */
  def dedupFirstSeenTtl[T](ds: Dataset[T], key: T => String,
      first: (T, T) => T, eventTimeMs: T => Long, ttlMs: Long)
      (implicit e: Encoder[T]): Dataset[T] = {
    require(ttlMs > 0, "TTL must be positive")
    implicit val seenEnc: Encoder[Seen] = Encoders.product[Seen]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(key)
      .flatMapGroupsWithState[Seen, T](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[T], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            // cold key aged past the replay horizon: forget it
            state.remove(); Iterator.empty
          } else {
            var count = 0L
            var maxEv = Long.MinValue
            var pick: Option[T] = None
            rows.foreach { r =>
              count += 1
              maxEv = math.max(maxEv, eventTimeMs(r))
              pick = Some(pick.fold(r)(first(_, r)))
            }
            val prior = state.getOption.map(_.count).getOrElse(0L)
            state.update(Seen(prior + count))
            // re-arm from the newest sighting; clamp above the current
            // watermark (setTimeoutTimestamp rejects timestamps the
            // watermark has already passed — a very-late row would
            // otherwise crash the batch)
            state.setTimeoutTimestamp(
              math.max(maxEv + ttlMs, state.getCurrentWatermarkMs() + 1))
            if (prior == 0L) pick.iterator else Iterator.empty
          }
      }
  }

}
