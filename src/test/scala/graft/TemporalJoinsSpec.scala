package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoins
import java.sql.Timestamp

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String)*) =
    rows.map { case (id, t, u, ty) => (id, Timestamp.valueOf(t), u, ty, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("as-of join picks the most recent prior view, null when none") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", 7L, "view"),
      (2L, "2024-01-01 00:05:00", 7L, "click"),  // matches view 1
      (3L, "2024-01-01 00:06:00", 7L, "view"),
      (4L, "2024-01-01 00:07:00", 7L, "click"),  // matches view 3
      (5L, "2024-01-01 00:01:00", 8L, "click"))  // no prior view
    val got = TemporalJoins.asofViewBeforeClick(e)
      .select("click_id", "last_view_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got === Map(2L -> Some(1L), 4L -> Some(3L), 5L -> None))
  }

  test("binned interval join equals the naive interval predicate") {
    // events straddling bin boundaries: gap exactly at tolerance kept,
    // beyond dropped, bin-crossing pairs found
    val e = ev(
      (1L, "2024-01-01 00:00:30", 7L, "click"),
      (2L, "2024-01-01 00:01:25", 7L, "view"),   // gap 55s ✓ (crosses bin)
      (3L, "2024-01-01 00:01:30", 7L, "view"),   // gap 60s ✓ boundary
      (4L, "2024-01-01 00:01:31", 7L, "view"),   // gap 61s ✗
      (5L, "2024-01-01 00:01:00", 8L, "view"))   // other user
    val got = TemporalJoins.intervalPairs(e, 60)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    // sorted Seq, not Set: intervalPairs emits each qualifying pair
    // EXACTLY once (no trailing distinct), so multiplicity is asserted too
    assert(got === Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }
}
