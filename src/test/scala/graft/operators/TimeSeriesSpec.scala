package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleHourly fills gaps linearly and marks interpolation") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 00:40:00"), 20.0), // same hour -> avg 15
      (1L, ts("2024-01-01 03:05:00"), 45.0), // 2-hour gap to fill
      (2L, ts("2024-01-01 05:00:00"), 7.0)   // single point: no gaps
    ).toDF("k", "t", "v")
    val got = TimeSeries.resampleHourly(df, "k", "t", "v")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(got === Set(
      (1L, "2024-01-01 00:00:00.0", 15.0, false),
      (1L, "2024-01-01 01:00:00.0", 25.0, true), // 15 + (45-15)*1/3
      (1L, "2024-01-01 02:00:00.0", 35.0, true),
      (1L, "2024-01-01 03:00:00.0", 45.0, false),
      (2L, "2024-01-01 05:00:00.0", 7.0, false)))
  }

  test("resampleHourly windows share one exchange; grid is row-local") {
    val df = (0 until 500).map(i =>
      ((i % 5).toLong, ts(f"2024-01-01 ${i % 20}%02d:30:00"),
        i.toDouble)).toDF("k", "t", "v")
    val out = TimeSeries.resampleHourly(df, "k", "t", "v")
    val p = out.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    // obs agg + grid agg + join + window sort: the fill windows must
    // NOT add exchanges beyond the join-side ones
    assert(!p.contains("CartesianProduct"), p)
    assert(exchanges <= 4, s"unexpected exchange count $exchanges:\n$p")
    // every key's grid is contiguous hours
    val rows = out.collect().groupBy(_.getLong(0))
    rows.values.foreach { rs =>
      val hours = rs.map(_.getTimestamp(1).getTime).sorted
      hours.sliding(2).foreach { case Array(a, b) =>
        assert(b - a == 3600 * 1000L)
      case _ => () }
    }
  }
}
