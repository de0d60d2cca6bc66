package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data and spreads the hot key") {
    // 90% of the big side hits one key
    val big = (1 to 20000).map(i => (if (i % 10 != 0) 1L else (i % 7).toLong, s"payload$i"))
      .toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"),
      (4L, "four"), (5L, "five"), (6L, "six")).toDF("k", "name")

    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)

    // the hot key's rows scatter across many salts
    val spread = big.filter(col("k") === 1)
      .withColumn("s", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)))
      .select("s").distinct().count()
    assert(spread >= 6, s"hot key spread across only $spread of 8 salts")
  }
}
