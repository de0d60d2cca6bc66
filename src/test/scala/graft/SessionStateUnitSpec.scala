package graft

import org.apache.spark.sql.streaming.TestGroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionizeStream._

/** Pure state-transition tests of the sessionizer (no streaming query). */
class SessionStateUnitSpec extends AnyFunSuite {

  private def ev(ts: Long, id: Long = 0, v: Double = 1.0) =
    Event(7L, id, new java.sql.Timestamp(ts / 1000), ts, v)

  test("gap within a batch closes and renumbers sessions") {
    val state = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.empty(), org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(), 0L, org.apache.spark.api.java.Optional.empty(), false)
    val out = updateUser(7L, Iterator(ev(0L), ev(GapMicros + 1L, 1)), state).toSeq
    assert(out.map(_.session_seq) == Seq(1L))
    assert(state.get.sessionSeq == 2L && state.get.nEvents == 1L)
  }

  test("timeout closure leaves a tombstone; the next session continues numbering") {
    val timeout = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()
    // session 1 open
    val s1 = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.of(OpenSession(1L, 0L, 10L, 3L, 5.0)), timeout, 0L, org.apache.spark.api.java.Optional.of(1L), true)
    val closed = updateUserWithTimeout(7L, Iterator.empty, s1).toSeq
    assert(closed.map(c => (c.session_seq, c.n_events)) == Seq((1L, 3L)))
    assert(s1.get.nEvents == 0L && s1.get.sessionSeq == 1L) // tombstone
    // later events resume at seq 2, not seq 1
    val s2 = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.of(s1.get), timeout, 100L, org.apache.spark.api.java.Optional.empty(), false)
    val out2 = updateUserWithTimeout(7L, Iterator(ev(GapMicros * 5)), s2).toSeq
    assert(out2.isEmpty)
    assert(s2.get.sessionSeq == 2L && s2.get.nEvents == 1L)
  }

  test("a tombstone that reaches its TTL is evicted silently") {
    val timeout = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()
    val s = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.of(OpenSession(4L, 0L, 10L, 0L, 0.0)), timeout, 0L, org.apache.spark.api.java.Optional.of(1L), true)
    assert(updateUserWithTimeout(7L, Iterator.empty, s).isEmpty)
    assert(s.isRemoved)
  }

  test("late within-gap events never regress session bounds") {
    val state = TestGroupState.create[OpenSession](
      org.apache.spark.api.java.Optional.of(OpenSession(1L, 0L, 1000000L, 2L, 2.0)),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(), 0L,
      org.apache.spark.api.java.Optional.empty(), false)
    // a late event 500ms after start merges without pulling lastMicros back
    val out = updateUser(7L, Iterator(ev(500000L, 9)), state).toSeq
    assert(out.isEmpty)
    assert(state.get.lastMicros == 1000000L && state.get.startMicros == 0L)
    assert(state.get.nEvents == 3L)
  }
}
