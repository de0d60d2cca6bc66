package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.UrlFilter

class CrawlPlanningSpec extends SparkSpecBase {

  test("dedup_minhash_tune: the planner derives the library's 16x4 default") {
    val rows = Dedup.minhashTune(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(6)))
      .sortBy(_._1)
    assert(rows.length == 7, "64 perms has 7 factorizations")
    val selected = rows.filter(_._5 == 1)
    assert(selected.length == 1)
    assert((selected.head._1, selected.head._2) == (16, 4),
      s"expected 16 bands x 4 rows at threshold 0.5, got $selected")
    // (1/16)^(1/4) = 0.5 exactly (powers of two stay exact through pow)
    assert(selected.head._3 == 0.5)
    // hand-computed catch probability at s=0.5: 1 - (1 - 0.5^4)^16
    val expect = math.floor((1.0 - math.pow(1.0 - math.pow(0.5, 4), 16)) * 10000) / 10000
    assert(selected.head._4 == expect)
    // more bands = catch more at any similarity: p_catch monotone in b
    assert(rows.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("host_stats: rollup invariants against the documents table") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val stats = UrlFilter.hostStatsQuery(spark, sf).collect()
    assert(stats.nonEmpty)
    assert(stats.map(_.getLong(1)).sum == total, "host doc counts partition the corpus")
    stats.foreach { r =>
      val (nDocs, nUrls, dup) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dup == nDocs - nUrls && dup >= 0)
      assert(r.getLong(4) > 0, "chars_sum positive")
      assert(r.getDouble(5) > 0, "mean_doc_chars positive")
    }
    // floor-rounded shares still account for (almost) the whole corpus
    val shareSum = stats.map(_.getDouble(6)).sum
    assert(shareSum > 0.9 && shareSum <= 1.0 + 1e-9, s"share sum $shareSum")
    // hosts come from the planted domain x tld grid
    stats.foreach { r =>
      val host = r.getString(0)
      assert(UrlFilter.Domains.exists(host.startsWith),
        s"unexpected host $host")
    }
  }

  test("url_filter window plan: exactly one exchange, no join") {
    val plan = UrlFilter.urlFilterQuery(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"url_filter should not join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }
}
