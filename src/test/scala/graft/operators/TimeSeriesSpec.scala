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

  test("linearTrend recovers a planted slope exactly; one-hour keys yield null") {
    // key 1: v = 3.00 + 2.50 * hours (exact), key 2: constant hour
    val rows = (0 until 10).map(i =>
      (1L, ts(f"2024-01-01 $i%02d:00:00"), 3.00 + 2.50 * i)) ++ Seq(
      (2L, ts("2024-01-01 05:10:00"), 4.0),
      (2L, ts("2024-01-01 05:50:00"), 8.0))
    val got = TimeSeries.linearTrend(rows.toDF("k", "t", "v"),
        "k", "t", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) === ((10L, Some(2.5), Some(3.0))))
    assert(got(2L) === ((2L, None, None)))
  }

  test("linearTrend matches a driver-side exact-integer reference on noise") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 300).map { i =>
      ((i % 4).toLong, ts(f"2024-01-0${i % 9 + 1} ${i % 24}%02d:00:00"),
        rnd.nextInt(10000) / 100.0)
    }
    val got = TimeSeries.linearTrend(rows.toDF("k", "t", "v"),
        "k", "t", "v")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2),
        r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val h0 = rs.map(r => r._2.getTime / 3600000L).min
      val pts = rs.map(r => (r._2.getTime / 3600000L - h0,
        math.round(r._3 * 100)))
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val den = (n * sxx - sx * sx).toDouble
      val slope = (n * sxy - sx * sy).toDouble / den / 100.0
      val inter = (sy * sxx - sx * sxy).toDouble / den / 100.0
      assert(got(k)._1 == slope && got(k)._2 == inter, s"key $k")
    }
  }

  test("rollingAnomalies flags exact-integer z-score outliers against history only") {
    // key 1: stable 10.00 +/- 0.02 baseline, one 50.0 spike, then a
    // return to baseline (the spike must not poison later flags via
    // its own row — but DOES enter later windows as history)
    val vals = Seq(10.00, 10.02, 9.98, 10.01, 9.99, 10.00, 50.0,
      10.01, 9.99)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (1L, ts(f"2024-01-01 00:${i * 5}%02d:00"), i.toLong, v) }
    val got = TimeSeries.rollingAnomalies(rows.toDF("k", "t", "id", "v"),
        "k", "t", "id", "v", window = 20, z = 3, minObs = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(got.contains((6L, 50.0)), s"spike not flagged: $got")
    assert(!got.exists(_._1 < 5L), "flag before minObs history")
    // exact-integer reference replay over every candidate row
    def flagged(i: Int): Boolean = {
      val hist = vals.slice(math.max(0, i - 20), i)
        .map(v => math.round(v * 100))
      val n = hist.size.toLong
      if (n < 5) false else {
        val yc = math.round(vals(i) * 100)
        val sy = hist.sum; val syy = hist.map(y => y * y).sum
        val lhs = (n * yc - sy) * (n * yc - sy)
        lhs > 9L * (n * syy - sy * sy)
      }
    }
    val expect = vals.indices.filter(flagged)
      .map(i => (i.toLong, vals(i))).toSet
    assert(got === expect)
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
