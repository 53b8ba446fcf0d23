package graft

import graft.operators.Events
import graft.plans.SessionAgg

/** Semantics tests for the whole-operator session aggregator. */
class SessionAggSpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60L * 1000000000L // a minute in ns

  test("hand-built fixture: gaps split, ids number per user in time order") {
    // user 1: events at 0, 10, 50 min (gap 30 min, 40 > 30 splits)
    // user 2: single event; user 3: events exactly 30 min apart (no
    // split — the gap must STRICTLY exceed the timeout, matching the
    // `> INTERVAL '30 minutes'` oracle)
    val df = Seq(
      (1L, 0L * Min), (1L, 10L * Min), (1L, 50L * Min),
      (2L, 5L * Min),
      (3L, 0L * Min), (3L, 30L * Min))
      .toDF("user_id", "ts")
    val out = SessionAgg(df, "user_id", "ts", 30L * Min)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 2L, 0L, 10L * Min),
      (1L, 2L, 1L, 50L * Min, 50L * Min),
      (2L, 1L, 1L, 5L * Min, 5L * Min),
      (3L, 1L, 2L, 0L, 30L * Min)))
  }

  test("native operator matches the window spelling row-for-row") {
    // full-result parity on the driver corpus: the custom exec and
    // the Exchange→Sort→Window→Window→HashAggregate plan must agree
    // on EVERY session (count, bounds, numbering)
    val native = Events.sessionizeNative(spark, sf)
      .as[(Long, Long, Long, String, String)].collect().toSeq
    val builtin = Events.sessionize(spark, sf)
      .select("user_id", "session_id", "n_events", "session_start", "session_end")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    assert(native.nonEmpty)
    assert(native == builtin)
  }

  test("string group keys work (UnsafeRow key copy, not reference reuse)") {
    // the exec compares group keys as UnsafeRows and copies them on
    // group change; a string key exercises the variable-length buffer
    // path where a missed copy would corrupt the emitted user column
    val df = Seq(
      ("alice", 0L), ("alice", 5L * Min), ("alice", 60L * Min),
      ("bob", 0L), ("carol", 90L * Min))
      .toDF("user_id", "ts")
    val out = SessionAgg(df, "user_id", "ts", 30L * Min)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("alice", 1L, 2L, 0L, 5L * Min),
      ("alice", 2L, 1L, 60L * Min, 60L * Min),
      ("bob", 1L, 1L, 0L, 0L),
      ("carol", 1L, 1L, 90L * Min, 90L * Min)))
  }

  test("empty input produces no sessions") {
    val df = Seq.empty[(Long, Long)].toDF("user_id", "ts")
    assert(SessionAgg(df, "user_id", "ts", Min).count() == 0L)
  }
}
