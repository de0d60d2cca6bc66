package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.lsh.LshParams

/**
 * Driver-side configuration (re-expression of the reference's
 * `config/SystemConfig.java:370` + `config.json`): every tunable the
 * reference exposes — LSH shape (m, lambda, tables, divisions, seed),
 * probe/refinement budgets, stabilization, rotation thresholds,
 * kVariants — is readable from a JSON file instead of being compiled
 * in. Defaults mirror the reference's `config.json` base profile and
 * its production behavior (stabilization formula off, see
 * [[StabilizationConfig]]); the two deliberate departures are scale
 * fixes the VERDICT asked for: IVF cells size from the corpus when
 * unset, and maxGlobalCandidates caps the candidate union.
 *
 * Like the reference, a config may carry named `profiles` whose
 * `overrides` overlay the base document (deep merge, reference
 * SystemConfig profile resolution); `load(path, Some(name))` applies
 * one.
 *
 * Spark posture: the config is parsed once on the driver and its
 * values flow into plans as literals/params — executors never read
 * files. `GraftConfig.active` picks up `-Dgraft.config=<path>` or
 * `GRAFT_CONFIG=<path>` (optionally `graft.profile` /
 * `GRAFT_PROFILE`) so the packaged entry points are tunable without
 * recompiling.
 */
/** D1 stabilization limiter. Disabled by default: the reference's
  * config.json flags it on, but its production refine path applies only
  * refinementLimit (the formula lives in CandidatePipelineTest), so the
  * faithful default behavior is OFF — enabling it is the documented
  * opt-in that tightens the per-query refine bound. */
final case class StabilizationConfig(
    enabled: Boolean = false,
    alpha: Double = 0.10,
    minCandidates: Int = 1200,
    targetRatio: Double = 1.25)

final case class RotationConfig(
    opsThreshold: Long = 500000000L,
    ageThresholdMs: Long = 86400000L)

final case class EvalConfig(
    kVariants: Seq[Int] = Seq(1, 5, 10, 20, 40, 60, 80, 100))

final case class QueryConfig(k: Int = 10, numQueries: Int = 20)

/** `cells <= 0` means size from the corpus (`IvfSearch.scaledCells`).
  * `maxCandidates` caps each query's candidate union before the exact
  * refine (the IVF twin of the LSH path's HARD_CAP): cells kept in
  * cell-distance probe order. */
final case class IvfConfig(cells: Int = 0, probes: Int = 4, maxCandidates: Int = 20000)

/** `maxCell` drops cells larger than the bound from the co-probe
  * self-join (same posture as dedup's `maxBucket`: one degenerate hot
  * cell of b vectors is O(b^2) join rows; near-dups dropped with a
  * hot cell still co-probe in their other probe cells). */
final case class NeardupConfig(cells: Int = 16, probes: Int = 4, topN: Int = 20,
    maxCell: Int = 100000)

/** Multi-round adaptive probe widening (reference `kAdaptive`,
  * config.json base.kAdaptive; disabled by default like the reference). */
final case class KAdaptiveConfig(
    enabled: Boolean = false,
    maxRounds: Int = 3,
    targetReturnRate: Double = 0.80,
    maxFanout: Double = 4000.0,
    probeFactor: Double = 1.5)

/** Sampled query diagnostics (reference `audit` config + QueryDiagnostics). */
final case class AuditConfig(
    enabled: Boolean = true,
    k: Int = 100,
    sampleEvery: Int = 250,
    worstKeep: Int = 25,
    failOnZeroHit: Boolean = false,
    zeroHitRateLimit: Double = 0.8,
    zeroHitMinQueries: Int = 5)

/** Distance-ratio denominator source (reference RatioSource enum,
  * ForwardSecureANNSystem.java:72, resolved at :232-236 from
  * `ratio.source`): `gt` trusts the ground-truth distances as given
  * (self-computed exact kNN — the most expensive job in the system at
  * corpus scale); `base` takes only the GT IDS and recomputes both
  * ratio distances against the loaded base vectors (an id equi-join,
  * no exact-kNN job — the reference's `-Dbase.path` BaseVectorReader,
  * :416-432); `auto` behaves as `gt` when trusted ground truth is in
  * hand, else `base` (the reference's `gt(auto)`/`base(auto)` label,
  * :1402-1407). */
final case class RatioConfig(source: String = "auto") {
  require(Seq("auto", "gt", "base").contains(source),
    s"ratio.source must be auto|gt|base, got '$source'")
}

/** Corpus-assembly knobs: `bucketBoundaries` picks how [[graft.operators.Corpus]]
  * draws its doc_id-range buckets — `width` (equal-width spans, zero
  * extra passes) or `quantile` (once-collected per-stratum
  * approx-quantile bounds embedded as literals, for corpora whose ids
  * cluster in a sliver of their span; balance only — numbering is
  * bucket-invariant either way). */
/** Product quantization ([[graft.query.PqSearch]]): `m` subspaces per
  * vector (the stored dim must divide by it), `codewords` per
  * subspace (16 = 4-bit codes; 256 = the byte-sized production norm),
  * `adcKeep` = ADC shortlist refined with exact distances per query. */
final case class PqConfig(m: Int = 8, codewords: Int = 16, adcKeep: Int = 64) {
  require(m > 0 && codewords > 1 && adcKeep > 0)
  require(codewords <= 256, s"pq.codewords=$codewords exceeds byte-sized codes (max 256)")
}

final case class CorpusConfig(bucketBoundaries: String = "width") {
  require(Seq("width", "quantile").contains(bucketBoundaries),
    s"corpus.bucketBoundaries must be width|quantile, got '$bucketBoundaries'")
}

/** `vocabPath`: a published tokenizer's merges file (HF `merges.txt`
  * format) — when set, the BPE counters apply THAT vocab instead of
  * corpus-fitting, so packing budgets match the trainer's tokenizer.
  * `unigramVocabPath`: a published SentencePiece-unigram vocab
  * (`spm_export_vocab` `piece<TAB>logprob` format — the Llama/T5
  * family); when set it takes precedence for the TRAINER-FACING
  * counters (tokenizer_fertility, seq_pack_bpe) via
  * [[graft.text.Tokenizers]], and `token_count_unigram` scores with
  * it instead of the corpus fit. Setting both is allowed: BPE entries
  * stay BPE, unigram wins only where "the trainer's tokenizer" is the
  * semantic. */
final case class BpeConfig(vocabPath: String = "", unigramVocabPath: String = "")

/** Count-Min sketch geometry ([[graft.operators.CorpusStats.cmsSketch]]):
  * width ~ e/eps for additive error eps*N, depth ~ ln(1/delta); the
  * 4x1024 default is the 32 KB demo sketch. Bounded loudly — the
  * sketch is the thing that must stay small. */
final case class CmsConfig(depth: Int = 4, width: Int = 1024) {
  require(depth >= 1 && depth <= 16, s"cms.depth=$depth out of [1,16]")
  require(width >= 16 && width <= (1 << 24), s"cms.width=$width out of [16,2^24]")
}

/** SemDeDup sizing: `cells = 0` auto-sizes to ~sqrt(N) via
  * `IvfSearch.scaledCells` (the IVF discipline); the default 16 is the
  * demo-corpus constant. `maxCell` guards degenerate cells from the
  * quadratic within-cell pair join. */
final case class SemDedupConfig(cells: Int = 16, maxCell: Int = 4096) {
  require(cells >= 0 && maxCell > 0)
}

/** Chunking geometry ([[graft.operators.Chunking]]): `tokens` per
  * chunk, `stride` between starts (overlap = tokens - stride). */
final case class ChunkConfig(tokens: Int = 64, stride: Int = 48) {
  require(tokens > 0 && stride > 0 && stride <= tokens,
    s"chunk needs 0 < stride <= tokens, got ($stride, $tokens)")
}

/** URL hygiene lists ([[graft.text.UrlFilter]]): registered domains on
  * the blocklist, and TLDs with a spam quality prior. Deployments feed
  * their own lists; the defaults are the planted-demo constants. */
final case class UrlConfig(
    blockedDomains: Seq[String] = Seq("blogspam", "adfarm"),
    lowQualityTlds: Seq[String] = Seq(".info", ".biz", ".xyz")) {
  require(lowQualityTlds.forall(_.startsWith(".")),
    s"url.lowQualityTlds entries must start with '.', got $lowQualityTlds")
}

/** DSIR importance selection ([[graft.operators.Dsir]]): hashed-bag
  * model buckets (fixed model size — the paper uses 10k in
  * production), the keep quantile, and the target-distribution
  * language proxy. */
final case class DsirConfig(buckets: Int = 256, keepP: Double = 0.75,
    targetLang: String = "en") {
  require(buckets > 0 && buckets <= (1 << 20),
    s"dsir.buckets out of range: $buckets")
  require(keepP > 0 && keepP < 1, s"dsir.keepP must be in (0,1): $keepP")
}

/** 5-gram stupid-backoff LM ([[graft.text.TextAnalysis.lmScore5gram]]):
  * the hash-band fraction the count tables train on. α stays the
  * Brants paper constant (like BM25's k1/b). */
final case class Lm5Config(trainFrac: Double = 0.7) {
  require(trainFrac > 0 && trainFrac < 1,
    s"lm5.trainFrac must be in (0,1): $trainFrac")
}

/** MMR diversified re-rank ([[graft.query.MmrRerank]]): `candidates`
  * = the bounded relevance shortlist MMR greedily re-ranks, `k` = how
  * many diversified picks it returns, `lambda` = the Carbonell &
  * Goldstein relevance/novelty trade-off (1.0 degenerates to plain
  * top-k). */
final case class MmrConfig(candidates: Int = 25, k: Int = 10, lambda: Double = 0.7) {
  require(candidates > 0, s"mmr.candidates must be positive: $candidates")
  require(k > 0 && k <= candidates,
    s"mmr.k must be in [1, candidates=$candidates]: $k")
  require(lambda >= 0.0 && lambda <= 1.0, s"mmr.lambda must be in [0,1]: $lambda")
}

/** Greedy k-center coreset ([[graft.operators.KCenter]]): number of
  * centers the farthest-point traversal selects. */
final case class KCenterConfig(k: Int = 8) {
  require(k > 0, s"kcenter.k must be positive: $k")
}

/** Search-mode profile (reference `config/SearchMode.java:3-5`):
  * `optimized` — the default serving behavior with every heuristic on
  * (probe-order HARD_CAP, Hamming-prefix refinement bound, opt-in
  * stabilization limiter, starved-query adaptive retry); or
  * `paper_baseline` — exact Peng et al. evaluation behavior for
  * apples-to-apples measurement runs: probes pinned to the paper
  * defaults, EVERY probed candidate exactly refined (no candidate
  * cap, no ranked-prefix bound, no stabilization), and no retry.
  * One switch, so an evaluation can flip the whole profile without
  * hunting the individual knobs. */
final case class SearchConfig(mode: String = "optimized") {
  require(Seq("optimized", "paper_baseline").contains(mode),
    s"search.mode must be optimized|paper_baseline, got '$mode'")
  def paperBaseline: Boolean = mode == "paper_baseline"

  /** Pin the probe budget to the paper default in baseline mode. */
  def pinParams(p: LshParams): LshParams =
    if (paperBaseline) p.copy(maxProbes = LshParams().maxProbes) else p
}

/** Streaming keyed-state hygiene: event-time TTL (seconds) for the
  * intake gates' state — [[graft.streaming.UrlIntake]]'s per-URL
  * owner record and [[graft.streaming.StreamingNearDup]]'s bucket
  * claimants age out this long after their last sighting (dup windows
  * in crawl pipelines are weeks, not forever; an idle key's state is
  * garbage-collected by the state store's event-time timeout). 0 =
  * retain forever — the exact batch-equivalence default. */
final case class StreamConfig(stateTtlSec: Int = 0) {
  require(stateTtlSec >= 0, s"stream.stateTtlSec must be >= 0: $stateTtlSec")
}

final case class GraftConfig(
    lsh: LshParams = LshParams(),
    stabilization: StabilizationConfig = StabilizationConfig(),
    rotation: RotationConfig = RotationConfig(),
    eval: EvalConfig = EvalConfig(),
    query: QueryConfig = QueryConfig(),
    ivf: IvfConfig = IvfConfig(),
    neardup: NeardupConfig = NeardupConfig(),
    kAdaptive: KAdaptiveConfig = KAdaptiveConfig(),
    audit: AuditConfig = AuditConfig(),
    ratio: RatioConfig = RatioConfig(),
    corpus: CorpusConfig = CorpusConfig(),
    pq: PqConfig = PqConfig(),
    bpe: BpeConfig = BpeConfig(),
    semdedup: SemDedupConfig = SemDedupConfig(),
    cms: CmsConfig = CmsConfig(),
    chunk: ChunkConfig = ChunkConfig(),
    url: UrlConfig = UrlConfig(),
    dsir: DsirConfig = DsirConfig(),
    lm5: Lm5Config = Lm5Config(),
    mmr: MmrConfig = MmrConfig(),
    kcenter: KCenterConfig = KCenterConfig(),
    search: SearchConfig = SearchConfig(),
    stream: StreamConfig = StreamConfig())

object GraftConfig {

  /** The JVM-wide config: `-Dgraft.config` / `GRAFT_CONFIG` path, else defaults. */
  lazy val active: GraftConfig =
    sys.props.get("graft.config").orElse(sys.env.get("GRAFT_CONFIG")) match {
      case Some(path) =>
        load(path, sys.props.get("graft.profile").orElse(sys.env.get("GRAFT_PROFILE")))
      case None => GraftConfig()
    }

  def load(path: String, profile: Option[String] = None): GraftConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8), profile)

  def parse(json: String, profile: Option[String] = None): GraftConfig = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    require(root != null && root.isObject, "config root must be a JSON object")
    val effective = profile match {
      case None => root
      case Some(name) =>
        val profiles = root.path("profiles")
        val hit = (0 until profiles.size())
          .map(i => profiles.get(i))
          .find(p => p.path("name").asText() == name)
          .getOrElse(throw new IllegalArgumentException(s"no profile named '$name'"))
        val overrides = hit.path("overrides")
        // a profile with no overrides selects the base unchanged
        if (!overrides.isObject) root
        else deepMerge(root.deepCopy[JsonNode](), overrides)
    }
    fromNode(effective)
  }

  /** Overlay `patch` onto `base` (objects merge recursively, scalars/arrays replace). */
  private def deepMerge(base: JsonNode, patch: JsonNode): JsonNode = {
    if (!base.isObject || !patch.isObject) return patch
    val obj = base.asInstanceOf[ObjectNode]
    patch.properties().forEach { e =>
      val existing = obj.get(e.getKey)
      if (existing != null && existing.isObject && e.getValue.isObject)
        deepMerge(existing, e.getValue)
      else obj.set(e.getKey, e.getValue)
    }
    obj
  }

  private def fromNode(n: JsonNode): GraftConfig = {
    val d = GraftConfig()
    def i(node: JsonNode, field: String, dflt: Int): Int =
      if (node.hasNonNull(field)) node.get(field).asInt() else dflt
    def l(node: JsonNode, field: String, dflt: Long): Long =
      if (node.hasNonNull(field)) node.get(field).asLong() else dflt
    def dbl(node: JsonNode, field: String, dflt: Double): Double =
      if (node.hasNonNull(field)) node.get(field).asDouble() else dflt
    def b(node: JsonNode, field: String, dflt: Boolean): Boolean =
      if (node.hasNonNull(field)) node.get(field).asBoolean() else dflt

    val lshN = n.path("lsh")
    val stabN = n.path("stabilization")
    val rotN = n.path("rotation")
    val evalN = n.path("eval")
    val queryN = n.path("query")
    val ivfN = n.path("ivf")
    val ndN = n.path("neardup")
    val kaN = n.path("kAdaptive")
    val auditN = n.path("audit")
    val ratioN = n.path("ratio")
    def s(node: JsonNode, field: String, dflt: String): String =
      if (node.hasNonNull(field)) node.get(field).asText() else dflt
    def sl(node: JsonNode, field: String, dflt: Seq[String]): Seq[String] =
      if (node.hasNonNull(field)) {
        val arr = node.get(field)
        require(arr.isArray, s"$field must be a JSON array of strings")
        (0 until arr.size()).map(arr.get(_).asText())
      } else dflt

    val kVariants =
      if (evalN.hasNonNull("kVariants")) {
        val arr = evalN.get("kVariants")
        require(arr.isArray && arr.size() > 0,
          "eval.kVariants must be a non-empty array of positive ints")
        val ks = (0 until arr.size()).map(arr.get(_).asInt())
        require(ks.forall(_ > 0), s"eval.kVariants must be positive, got $ks")
        ks
      } else d.eval.kVariants

    GraftConfig(
      lsh = LshParams(
        m = i(lshN, "m", d.lsh.m),
        lambda = i(lshN, "lambda", d.lsh.lambda),
        tables = i(lshN, "tables", d.lsh.tables),
        divisions = i(lshN, "divisions", d.lsh.divisions),
        seed = l(lshN, "seed", d.lsh.seed),
        blockSize = i(lshN, "blockSize", d.lsh.blockSize),
        maxProbes = i(lshN, "maxProbes", d.lsh.maxProbes),
        refinementLimit = i(lshN, "refinementLimit", d.lsh.refinementLimit),
        maxGlobalCandidates = i(lshN, "maxGlobalCandidates", d.lsh.maxGlobalCandidates)),
      stabilization = StabilizationConfig(
        enabled = b(stabN, "enabled", d.stabilization.enabled),
        alpha = dbl(stabN, "alpha", d.stabilization.alpha),
        minCandidates = i(stabN, "minCandidates", d.stabilization.minCandidates),
        targetRatio = dbl(stabN, "targetRatio", d.stabilization.targetRatio)),
      rotation = RotationConfig(
        opsThreshold = l(rotN, "opsThreshold", d.rotation.opsThreshold),
        ageThresholdMs = l(rotN, "ageThresholdMs", d.rotation.ageThresholdMs)),
      eval = EvalConfig(kVariants = kVariants),
      query = QueryConfig(
        k = i(queryN, "k", d.query.k),
        numQueries = i(queryN, "numQueries", d.query.numQueries)),
      ivf = IvfConfig(
        cells = i(ivfN, "cells", d.ivf.cells),
        probes = i(ivfN, "probes", d.ivf.probes),
        maxCandidates = i(ivfN, "maxCandidates", d.ivf.maxCandidates)),
      neardup = NeardupConfig(
        cells = i(ndN, "cells", d.neardup.cells),
        probes = i(ndN, "probes", d.neardup.probes),
        topN = i(ndN, "topN", d.neardup.topN),
        maxCell = i(ndN, "maxCell", d.neardup.maxCell)),
      kAdaptive = KAdaptiveConfig(
        enabled = b(kaN, "enabled", d.kAdaptive.enabled),
        maxRounds = i(kaN, "maxRounds", d.kAdaptive.maxRounds),
        targetReturnRate = dbl(kaN, "targetReturnRate", d.kAdaptive.targetReturnRate),
        maxFanout = dbl(kaN, "maxFanout", d.kAdaptive.maxFanout),
        probeFactor = dbl(kaN, "probeFactor", d.kAdaptive.probeFactor)),
      audit = AuditConfig(
        enabled = b(auditN, "enabled", d.audit.enabled),
        k = i(auditN, "k", d.audit.k),
        sampleEvery = i(auditN, "sampleEvery", d.audit.sampleEvery),
        worstKeep = i(auditN, "worstKeep", d.audit.worstKeep),
        failOnZeroHit = b(auditN, "failOnZeroHit", d.audit.failOnZeroHit),
        zeroHitRateLimit = dbl(auditN, "zeroHitRateLimit", d.audit.zeroHitRateLimit),
        zeroHitMinQueries = i(auditN, "zeroHitMinQueries", d.audit.zeroHitMinQueries)),
      ratio = RatioConfig(source = s(ratioN, "source", d.ratio.source)),
      corpus = CorpusConfig(
        bucketBoundaries =
          s(n.path("corpus"), "bucketBoundaries", d.corpus.bucketBoundaries)),
      pq = PqConfig(
        m = i(n.path("pq"), "m", d.pq.m),
        codewords = i(n.path("pq"), "codewords", d.pq.codewords),
        adcKeep = i(n.path("pq"), "adcKeep", d.pq.adcKeep)),
      bpe = BpeConfig(
        vocabPath = s(n.path("bpe"), "vocabPath", d.bpe.vocabPath),
        unigramVocabPath =
          s(n.path("bpe"), "unigramVocabPath", d.bpe.unigramVocabPath)),
      cms = CmsConfig(
        depth = i(n.path("cms"), "depth", d.cms.depth),
        width = i(n.path("cms"), "width", d.cms.width)),
      semdedup = SemDedupConfig(
        cells = i(n.path("semdedup"), "cells", d.semdedup.cells),
        maxCell = i(n.path("semdedup"), "maxCell", d.semdedup.maxCell)),
      chunk = ChunkConfig(
        tokens = i(n.path("chunk"), "tokens", d.chunk.tokens),
        stride = i(n.path("chunk"), "stride", d.chunk.stride)),
      url = UrlConfig(
        blockedDomains = sl(n.path("url"), "blockedDomains", d.url.blockedDomains),
        lowQualityTlds = sl(n.path("url"), "lowQualityTlds", d.url.lowQualityTlds)),
      dsir = DsirConfig(
        buckets = i(n.path("dsir"), "buckets", d.dsir.buckets),
        keepP = dbl(n.path("dsir"), "keepP", d.dsir.keepP),
        targetLang = s(n.path("dsir"), "targetLang", d.dsir.targetLang)),
      lm5 = Lm5Config(
        trainFrac = dbl(n.path("lm5"), "trainFrac", d.lm5.trainFrac)),
      mmr = MmrConfig(
        candidates = i(n.path("mmr"), "candidates", d.mmr.candidates),
        k = i(n.path("mmr"), "k", d.mmr.k),
        lambda = dbl(n.path("mmr"), "lambda", d.mmr.lambda)),
      kcenter = KCenterConfig(
        k = i(n.path("kcenter"), "k", d.kcenter.k)),
      search = SearchConfig(
        mode = s(n.path("search"), "mode", d.search.mode)),
      stream = StreamConfig(
        stateTtlSec = i(n.path("stream"), "stateTtlSec", d.stream.stateTtlSec)))
  }
}
