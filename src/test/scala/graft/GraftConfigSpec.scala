package graft

import graft.config.GraftConfig
import graft.crypto.KeyLifecycle
import graft.lsh.{Lsh, LshParams}

class GraftConfigSpec extends SparkSpecBase {

  test("empty config parses to exact defaults (pre-config behavior)") {
    assert(GraftConfig.parse("{}") == GraftConfig())
    assert(GraftConfig.parse("""{"lsh": {}}""") == GraftConfig())
  }

  test("fields override individually; unknown fields ignored") {
    val c = GraftConfig.parse(
      """{"lsh": {"m": 15, "divisions": 2, "maxProbes": 7, "refinementLimit": 123},
        |"query": {"k": 5}, "eval": {"kVariants": [1, 3]},
        |"rotation": {"ageThresholdMs": 1000}, "mystery": {"x": 1}}""".stripMargin)
    assert(c.lsh.m == 15 && c.lsh.divisions == 2 && c.lsh.maxProbes == 7)
    assert(c.lsh.refinementLimit == 123 && c.lsh.tables == 8) // untouched default
    assert(c.query.k == 5 && c.query.numQueries == 20)
    assert(c.eval.kVariants == Seq(1, 3))
    assert(c.rotation.ageThresholdMs == 1000L)
  }

  test("chunk and url sections parse, validate, and default correctly") {
    val c = GraftConfig.parse(
      """{"chunk": {"tokens": 128, "stride": 96},
        |"url": {"blockedDomains": ["spamco"], "lowQualityTlds": [".zz"]}}""".stripMargin)
    assert(c.chunk.tokens == 128 && c.chunk.stride == 96)
    assert(c.url.blockedDomains == Seq("spamco") && c.url.lowQualityTlds == Seq(".zz"))
    // defaults untouched when the section is absent
    assert(GraftConfig.parse("{}").chunk == graft.config.ChunkConfig())
    assert(GraftConfig.parse("{}").url.blockedDomains == Seq("blogspam", "adfarm"))
    // invalid geometry / list shape fail loudly
    intercept[IllegalArgumentException](
      GraftConfig.parse("""{"chunk": {"tokens": 10, "stride": 20}}"""))
    intercept[IllegalArgumentException](
      GraftConfig.parse("""{"url": {"lowQualityTlds": ["zz"]}}"""))
  }

  test("dsir and lm5 sections parse, validate, and default correctly") {
    val c = GraftConfig.parse(
      """{"dsir": {"buckets": 1024, "keepP": 0.5, "targetLang": "fr"},
        |"lm5": {"trainFrac": 0.9}}""".stripMargin)
    assert(c.dsir.buckets == 1024 && c.dsir.keepP == 0.5 && c.dsir.targetLang == "fr")
    assert(c.lm5.trainFrac == 0.9)
    assert(GraftConfig.parse("{}").dsir == graft.config.DsirConfig())
    assert(GraftConfig.parse("{}").lm5 == graft.config.Lm5Config())
    intercept[IllegalArgumentException](
      GraftConfig.parse("""{"dsir": {"keepP": 1.5}}"""))
    intercept[IllegalArgumentException](
      GraftConfig.parse("""{"lm5": {"trainFrac": 0.0}}"""))
  }

  test("cms section parses, validates, and defaults correctly") {
    val c = GraftConfig.parse("""{"cms": {"depth": 6, "width": 4096}}""")
    assert(c.cms.depth == 6 && c.cms.width == 4096)
    assert(GraftConfig.parse("{}").cms == graft.config.CmsConfig())
    intercept[IllegalArgumentException](
      GraftConfig.parse("""{"cms": {"depth": 0}}"""))
    intercept[IllegalArgumentException](
      GraftConfig.parse("""{"cms": {"width": 8}}"""))
  }

  test("profile overrides overlay the base document (reference profiles)") {
    val json =
      """{"lsh": {"m": 25, "divisions": 3},
        |"profiles": [
        |  {"name": "fast", "overrides": {"lsh": {"m": 15, "divisions": 2},
        |                                 "stabilization": {"alpha": 0.08}}},
        |  {"name": "recall", "overrides": {"lsh": {"m": 30, "lambda": 3}}}]}""".stripMargin
    val base = GraftConfig.parse(json)
    assert(base.lsh.m == 25 && base.lsh.divisions == 3)
    val fast = GraftConfig.parse(json, Some("fast"))
    assert(fast.lsh.m == 15 && fast.lsh.divisions == 2)
    assert(fast.stabilization.alpha == 0.08)
    assert(fast.lsh.tables == 8) // base-level default survives the overlay
    val recall = GraftConfig.parse(json, Some("recall"))
    assert(recall.lsh.m == 30 && recall.lsh.lambda == 3 && recall.lsh.divisions == 3)
    intercept[IllegalArgumentException](GraftConfig.parse(json, Some("nope")))
  }

  test("the shipped example config parses, defaults-equal, and both profiles resolve") {
    val path = "/root/repo/conf/config.example.json"
    assert(GraftConfig.load(path) == GraftConfig()) // example base == defaults
    val fast = GraftConfig.load(path, Some("fast_m15_d2"))
    assert(fast.lsh.m == 15 && fast.lsh.divisions == 2 && fast.stabilization.enabled)
    val hr = GraftConfig.load(path, Some("highrecall_m30_l3_d4"))
    assert(hr.lsh.m == 30 && hr.lsh.lambda == 3 && hr.lsh.maxProbes == 10)
    // reference SearchMode pair: PAPER_BASELINE strips the heuristics,
    // OPTIMIZED turns them on
    val base = GraftConfig.load(path, Some("paper_baseline"))
    assert(!base.stabilization.enabled && !base.kAdaptive.enabled && base.lsh.maxProbes == 5)
    val opt = GraftConfig.load(path, Some("optimized"))
    assert(opt.stabilization.enabled && opt.kAdaptive.enabled && opt.lsh.maxProbes == 8)
  }

  test("load reads a file from disk") {
    val f = java.nio.file.Files.createTempFile("graft-config", ".json")
    java.nio.file.Files.write(f, """{"query": {"k": 3}}""".getBytes)
    try assert(GraftConfig.load(f.toString).query.k == 3)
    finally java.nio.file.Files.delete(f)
  }

  test("a non-default config actually changes the fitted model and probe plan") {
    val emb = Tables.embeddings(spark, sf)
    val c = GraftConfig.parse("""{"lsh": {"m": 15, "divisions": 2, "maxProbes": 2}}""")
    val model = Lsh.fit(emb, "embedding", c.lsh)
    assert(model.gfs.length == 8 && model.gfs.head.length == 2) // divisions from config
    assert(model.g(0, 0).m == 15)
    val built = graft.index.LshIndex.build(
      graft.index.LshIndex.codes(emb, "vec_id", "embedding", model), c.lsh.blockSize)
    val probed = graft.query.AnnQuery.probeBlocks(
      spark, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3), model, built)
    // maxProbes=2 and divisions=2: exactly 2 blocks per (q, t, d), 8*2 (t,d)s
    val perQ = probed.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) == 2L * 8 * 2), s"probe counts ${perQ.mkString(",")}")
  }

  test("age-based rotation policy: due on age even under the ops budget") {
    import spark.implicits._
    val records = Seq((1L, 1), (2L, 1)).toDF("id", "kv")
    // 2 records << maxOps, but age exceeds the threshold
    assert(KeyLifecycle.rotationDue(records, 1, maxOps = 1000,
      createdAtMs = 0L, nowMs = 90000000L, ageThresholdMs = 86400000L))
    // young and under budget: not due
    assert(!KeyLifecycle.rotationDue(records, 1, maxOps = 1000,
      createdAtMs = 0L, nowMs = 1000L, ageThresholdMs = 86400000L))
    // ops threshold still triggers on its own
    assert(KeyLifecycle.rotationDue(records, 1, maxOps = 2,
      createdAtMs = 0L, nowMs = 1000L, ageThresholdMs = 86400000L))
  }
}
