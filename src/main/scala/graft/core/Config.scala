package graft.core

/** Engine configuration mirroring the reference's constants.
  *
  * Sources (reference, read-only, cited for provenance):
  *  - weights 0.4/0.3/0.2/0.1: /root/reference/config/settings.py:56-59
  *  - thresholds HIGH 0.72 / LOW 0.60: /root/reference/config/settings.py:14-15
  *  - type multiplier 1.0 match / 0.1 mismatch / 1.0 missing:
  *    /root/reference/config/settings.py:64-65, services/disambiguation.py:300-311
  *  - CrossEncoder normalization min -6.5 / max 7.7 clamp [0,1]:
  *    /root/reference/services/disambiguation.py:42-51
  *  - retrieval fan-out top_k=10: /root/reference/config/settings.py:18
  *  - type-branch cosine floor 0.1: /root/reference/services/disambiguation.py:193
  *  - embedding dim 1024 (BGE-M3): /root/reference/config/settings.py:106.
  *    The sandbox has no BGE-M3; the engine uses a deterministic hashed
  *    char-n-gram embedder (same role as the reference's own seeded fallback,
  *    services/vectorization.py:315-334). Dim is configurable; default 64 keeps
  *    the 100TB-scale join cheap while preserving the scoring semantics.
  */
final case class GraftConfig(
    bgeWeight: Double = 0.4,
    crossEncoderWeight: Double = 0.3,
    fuzzWeight: Double = 0.2,
    levenshteinWeight: Double = 0.1,
    highThreshold: Double = 0.72,
    lowThreshold: Double = 0.60,
    typeMatchBonus: Double = 1.0,
    typeMismatchPenalty: Double = 0.1,
    topK: Int = 10,
    cosineFloor: Double = 0.1,
    // CrossEncoder logit normalization range (disambiguation.py:42-51):
    // linear (s - min)/(max - min), clamped [0,1]. The offline TF-cosine
    // surrogate is already in [0,1], so these apply only when a real logit
    // model is plugged in — retained as config per SURVEY X5.
    ceNormMin: Double = -6.5,
    ceNormMax: Double = 7.7,
    embeddingDim: Int = 64,
    // blocking: char n-gram sizes used as candidate-join keys
    blockNgramSize: Int = 3,
    // grams whose entity-side document frequency exceeds this are dropped from
    // the blocking index (low selectivity == all cost, no recall value).
    blockMaxDf: Long = 1000L,
    // salting replication factor for hot blocking keys
    saltBuckets: Int = 8,
    // candidate-JOIN fan-out ceiling: blocking keys shared by more than this
    // many ENTITIES are dropped from the mention-entity equi-join (each such
    // key contributes |mentions with key| x df pairs while carrying little
    // selectivity; recall for its members is held by their rarer keys —
    // full surfaces, rare grams/tokens, LSH buckets). Channel-AGNOSTIC and
    // accumulator-accounted, which means two documented consequences above
    // this df: (a) type keys for types with blockJoinMaxDf+1 ..
    // typeBlockMaxEntities members are indexed but never joined — the
    // effective type-channel ceiling is min(typeBlockMaxEntities,
    // blockJoinMaxDf), the reference's score-every-same-type-entity branch
    // being exactly the quadratic the blocked tier must bound; (b) the
    // full-surface exact-recall guarantee is scoped to surfaces shared by
    // <= blockJoinMaxDf entities (beyond that, name identity carries no
    // selectivity and disambiguation rests on ctx/LSH keys anyway). A no-op
    // below 256-entity collisions, i.e. invisible to the small-dictionary
    // fixtures; the same ceiling bounds the dictionary self-dedup join
    // (Scorer.entityDupEdges). The mega-dictionary P/R referee
    // (app.MegaDictBench) measures the actual recall effect.
    blockJoinMaxDf: Long = 256L,
    // decision-tier switch: dictionaries up to this many entities are scored
    // by the exact broadcast sweep (map-only over mentions — no candidate
    // shuffle, no hot keys, bit-exact vs the brute-force oracle; per-mention
    // cost grows O(|dict|) in cheap bound flops). Beyond it the blocked
    // candidate join (n-gram/type/LSH keys + salting) takes over as the
    // recall-gated scale path.
    broadcastSweepMaxDict: Long = 10000L,
    // type blocking channel (reference type branch, disambiguation.py:175-197):
    // types with more entities than this cap are dropped from the blocking
    // INDEX (a million-entity type would make the type key a quadratic hot
    // key). NOTE the JOIN additionally enforces blockJoinMaxDf, so the
    // effective type-channel ceiling is min(typeBlockMaxEntities,
    // blockJoinMaxDf) — raise both to widen the type branch.
    typeBlockMaxEntities: Long = 10000L,
    // embedding sign-LSH blocking channel (the FAISS-retrieval analog):
    // tables x bits sign-hyperplane buckets over the embedding column
    lshTables: Int = 4,
    lshBits: Int = 12,
    // blocked-tier shuffle sizing (KgPipeline.autoShufflePartitions): the
    // scoring join's per-task working set is ~estMentionBytes per mention
    // (prepped side struct + tf arrays + candidate id list + join row
    // overhead); partitions are derived so one task's slice stays near
    // targetSliceBytes. Round-3 evidence: 102.5k entities x 1M turns OOMs an
    // 8g JVM at partitions=cores(32) and completes at 160 — per-task slice
    // size, not the algorithm (BASELINE.md corpus axis). These defaults give
    // that cell ~250 partitions with no caller knob.
    targetSliceBytes: Long = 32L << 20,
    estMentionBytes: Long = 8192L,
    forceDecision: Boolean = false,
    // X13/X14 reasoning/details language: "en" (default; documented
    // divergence from the reference's zh originals) or "zh"
    // (engine-authored zh templates — Scoring.*TemplateZh)
    reasoningLang: String = "en"
) {
  def midThreshold: Double = (highThreshold + lowThreshold) / 2.0

  /** X5 — linear CrossEncoder-logit normalization, clamped to [0,1]
    * (reference disambiguation.py:42-51). */
  def ceNormalize(logit: Double): Double =
    math.min(1.0, math.max(0.0, (logit - ceNormMin) / (ceNormMax - ceNormMin)))
}

object GraftConfig { val default: GraftConfig = GraftConfig() }
