package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data mixing.
  *
  * `df.stat.sampleBy` draws per-row randoms: membership changes across
  * re-runs, retried tasks, and engines — useless for a dataset recipe that
  * must be auditable and re-buildable. Here membership is a PURE FUNCTION
  * of the row id: keep a row iff `md5_60bit(id) mod B < rate(stratum)·B`.
  * Any engine that can compute md5 reproduces the exact sample (the x20
  * oracle does, in DuckDB); changing the rate only grows/shrinks the kept
  * set monotonically (a 10% sample is a subset of a 20% sample), which is
  * what you want when scaling a data mix up or down.
  *
  * Map-side filter, codegen'd, zero shuffle — scan-speed at any size.
  */
object Sampling {

  /** Per-stratum deterministic sample: `rates` maps stratum value → keep
    * fraction in [0, 1]; strata absent from the map use `defaultRate`.
    *
    * The bucket threshold is pre-rounded to an INTEGER on the driver
    * (`math.round(rate * buckets)`): comparing against the raw double
    * product would shift the boundary for non-representable rates
    * (0.1 * 10000 = 1000.0000000000001 admits one extra bucket), making the
    * effective rate off by 1/buckets from the stated fraction. */
  def stratified(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      buckets: Int = 10000): DataFrame = {
    val bucket = hashBucket(col(idCol), buckets)
    val thresholdExpr = rates.foldLeft(lit(math.round(defaultRate * buckets)): Column) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(math.round(v * buckets))).otherwise(acc)
    }
    df.filter(bucket < thresholdExpr)
  }

  /** Uniform deterministic sample at `rate` (integer threshold — see
    * [[stratified]]). */
  def uniform(df: DataFrame, idCol: String, rate: Double, buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(col(idCol), buckets) < lit(math.round(rate * buckets)))

  /** Portable hash bucket in [0, buckets): DuckDB computes the identical
    * value as `CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 15))
    * AS BIGINT) % buckets` (the 60-bit hash is non-negative, so % == pmod).
    */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(PortableHash.md5Long(id.cast("string")), lit(buckets.toLong))

  /** Deterministic WEIGHTED sampling without replacement, per group —
    * Efraimidis–Spirakis (IPL 2006) with the randomness replaced by the
    * portable hash: each row draws u ∈ (0,1) as a pure function of its id
    * and ranks by −ln(u)/w ascending; the k best per group are an exact
    * weight-proportional sample, reproducible on any engine and stable
    * under retries. The scheme behind auditable "sample long documents
    * proportionally more" training-mix draws.
    *
    * Ranking uses the same skew-free machinery as the group-wise top-k
    * (x21): lossless sketch pre-prune, then the two-phase ordinal — no
    * low-cardinality window. Weights must be > 0.
    *
    * @return input columns + `sample_rank` (1..k per group) */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, groupCol: String,
      k: Int): DataFrame = {
    val m = 1048576L // 2^20 hash buckets → u ∈ (0,1) at ~1e-6 resolution
    val u = (pmod(PortableHash.md5Long(col(idCol).cast("string"), "ws:"),
      lit(m)) + lit(0.5)) / lit(m.toDouble)
    val scored = df.withColumn("graft_es", -log(u) / col(weightCol))
    val pruned = Ordinals.approxTopKPrune(scored, groupCol, "graft_es", k)
    Ordinals.perKeyOrdinal(pruned, groupCol, Seq("graft_es", idCol))
      .filter(col("ordinal") < k)
      .withColumn("sample_rank", col("ordinal") + 1L)
      .drop("graft_es", "ordinal")
  }

  /** Deterministic mixture rebalancing: cut each group down so the kept
    * set matches the `targets` proportions EXACTLY (largest feasible
    * total), keeping each group's smallest-hash rows — the corpus-mixing
    * primitive ("50% web, 30% code, 20% books") as an auditable pure
    * function of the data. Groups absent from `targets` are dropped.
    *
    * Driver computes the per-group quotas from one tiny count aggregate
    * (T = min over groups of count/target, quota = floor(T·target)); rows
    * then rank by portable hash within their group through the same
    * skew-free ordinal as [[weightedSample]] and keep rank < quota. */
  def rebalanceMix(
      df: DataFrame, idCol: String, groupCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty and positive")
    require(df.schema(groupCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"rebalanceMix groups on string columns; '$groupCol' is " +
        s"${df.schema(groupCol).dataType.simpleString} — cast it first " +
        "(targets are keyed by string)")
    val counts = df.filter(col(groupCol).isin(targets.keys.toSeq: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("graft_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(targets.keySet.subsetOf(counts.keySet),
      s"groups with zero rows cannot meet a positive target: " +
        s"${targets.keySet -- counts.keySet}")
    val t = targets.map { case (g, p) => counts(g) / p }.min
    val quota = targets.map { case (g, p) => g -> math.floor(t * p).toLong }
    val quotaExpr = quota.foldLeft(lit(0L): Column) { case (acc, (g, q)) =>
      when(col(groupCol) === g, lit(q)).otherwise(acc)
    }
    val hashed = df.filter(col(groupCol).isin(targets.keys.toSeq: _*))
      .withColumn("graft_h",
        PortableHash.md5Long(col(idCol).cast("string"), "mix:"))
    Ordinals.perKeyOrdinal(hashed, groupCol, Seq("graft_h", idCol))
      .filter(col("ordinal") < quotaExpr)
      .drop("graft_h", "ordinal")
  }

  /** TEMPERATURE-scaled mixture weights: the standard multilingual /
    * multi-source rebalancing rule (Devlin et al., mBERT exponentiated
    * smoothing; Conneau & Lample, XLM §3.1; also the "alpha sampling" in
    * GPT-3's data mixing) — sample source i with probability
    * p_i ∝ c_i^alpha instead of its raw token share c_i/Σc, flattening
    * the head so low-resource sources are not drowned out (alpha = 1
    * keeps natural proportions; alpha = 0 is uniform; 0.5–0.7 is the
    * published sweet spot). Returns per group: doc/token counts, the raw
    * and temperature share, and `up_weight` = share_temp / share_raw —
    * the per-source sampling multiplier a mixing job feeds to
    * [[weightedSample]] (> 1 ⇒ upsample, < 1 ⇒ downsample).
    *
    * Determinism across engines: c_i^alpha is quantized to integer
    * units BEFORE the cross-group sum, so both shares are ratios of
    * exact integers — immune to float summation order, which Spark's
    * partial aggregation does not fix (the same integer-quantized-sum
    * discipline as the pair-matrix means). The quantization is RELATIVE
    * to the largest group — floor((c_i/c_max)^alpha · 1e12) — so the
    * units can never overflow a long no matter the token scale (an
    * absolute ·1e6 quantization of tokens^alpha wraps negative at
    * trillion-token sources for alpha near 1, silently corrupting every
    * share; the ratio is ≤ 1e12 per group, safe for millions of
    * groups). With the default alpha = 0.5 the power is sqrt —
    * correctly rounded per IEEE 754 on every engine, so the quantized
    * units are bit-identical everywhere; other alphas go through pow(),
    * whose last-ulp behavior is libm-specific (fine in production, but
    * the value-hash oracle pins the sqrt path).
    *
    * Plan: ONE hash-partitioned corpus groupBy for the counts (partial
    * aggregation map-side), materialized so the max-group peek and the
    * totals branch read the tiny |groups|-row frame, not the corpus. */
  def temperatureMix(
      docs: DataFrame, textCol: String, grpCol: String,
      alpha: Double = 0.5,
      merges: Seq[(String, String)] = Nil): DataFrame = {
    // validate alpha BEFORE the corpus pass below materializes — the
    // same require sits in temperatureMixFromCounts (the shared core),
    // but reaching it from here would cost a full tokenize/aggregate
    // first just to reject a bad parameter
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    val counts = Dedup.materialize(docs
      .select(col(grpCol).as("grp"),
        Bpe.encodedSize(col(textCol), merges).cast("long").as("graft_tok"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_tok")).as("tokens")))
    temperatureMixFromCounts(counts, grpCol, alpha)
  }

  /** The share math of [[temperatureMix]] over an ALREADY-AGGREGATED
    * (grp, n_docs, tokens) frame — the core [[temperatureMix]] (which
    * tokenizes the corpus) and
    * [[graft.ext.Bpe.temperatureMixFromState]] (which reads persisted
    * per-doc encoded counts) share, so both produce bit-identical
    * shares from the same counts. `counts` must be materialized and
    * |groups|-sized (it is peeked twice: max group + totals). */
  private[ext] def temperatureMixFromCounts(
      counts: DataFrame, grpCol: String, alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    // an empty corpus yields a null max (head() would NPE on getLong) and
    // an all-null-token corpus a null/zero one — either way ratio = 0/0 =
    // NaN quantized to null units, silently corrupting every downstream
    // share. Fail with a clear message instead.
    val maxRow = counts.agg(max(col("tokens"))).head()
    require(!maxRow.isNullAt(0) && maxRow.getLong(0) > 0L,
      "temperatureMix: no group has a positive token count (empty corpus " +
        "or all-null texts) — shares are undefined")
    val tmax = maxRow.getLong(0)
    val ratio = col("tokens").cast("double") / lit(tmax.toDouble)
    val scaled =
      if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, alpha)
    val withQ = counts
      .withColumn("graft_paq", floor(scaled * 1e12).cast("long"))
    val totals = withQ.agg(
      sum(col("tokens")).as("graft_tott"), sum(col("graft_paq")).as("graft_totp"))
    val shareRaw = col("tokens").cast("double") / col("graft_tott")
    val shareTemp = col("graft_paq").cast("double") / col("graft_totp")
    withQ.crossJoin(broadcast(totals))
      .select(col("grp").as(grpCol), col("n_docs"), col("tokens"),
        Dedup.round4(shareRaw).as("share_raw"),
        Dedup.round4(shareTemp).as("share_temp"),
        Dedup.round4(shareTemp / shareRaw).as("up_weight"))
  }

  /** CAP-CONSTRAINED temperature mix (water-filling): the production
    * guardrail [[temperatureMix]] needs before its shares become a
    * recipe — temperature flattening can hand a tiny source a huge
    * up-weight (epochs over the same few documents = memorization
    * risk), so each source's final share is capped at
    * `maxUp × its natural share` (`maxUpMilli`/1000, an exact rational)
    * and the capped sources' excess redistributes proportionally among
    * the uncapped — which can push ANOTHER source over its cap, so the
    * redistribution iterates to fixpoint (each round caps ≥ 1 new
    * source or stops ⇒ ≤ |sources| rounds).
    *
    * Determinism across engines: every step after the one quantization
    * is EXACT INTEGER arithmetic — temperature units are
    * [[temperatureMix]]'s floor((c_i/c_max)^α·1e12) longs, caps and
    * shares live in parts-per-million (floor division, all operands
    * positive), and the per-round capped test is
    * `remaining·u_i / Σ_uncapped u > cap_i` in those units. Shares are
    * floors, so Σ final ≤ 1e6 with ≤ |sources| ppm of rounding dust
    * left unassigned (documented, not redistributed — determinism over
    * the last ppm). The oracle unrolls the rounds with the identical
    * integer ops (HUGEINT `//`), so the fixpoint hash-matches.
    *
    * Scale shape: ONE corpus tokenize/aggregate (the same materialized
    * |groups|-row counts frame as [[temperatureMix]]); the water-fill
    * itself runs on the driver over that frame — |sources| is recipe-
    * sized by nature and the require names the remedy. */
  def cappedTemperatureMix(
      docs: DataFrame, textCol: String, grpCol: String,
      maxUpMilli: Long, alpha: Double = 0.5,
      merges: Seq[(String, String)] = Nil,
      maxGroups: Int = 100000): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    // a cap below 1x natural share is unsatisfiable: the cap masses
    // then sum below 1e6 ppm, the water-fill caps EVERY source, and the
    // result silently leaves mass unassigned (share_final_ppm summing
    // far below 1e6 — way beyond the documented rounding dust)
    require(maxUpMilli >= 1000L,
      s"maxUpMilli (the cap multiplier in 1/1000 units) must be >= 1000 " +
        s"(a cap below 1x natural share cannot absorb the full mix), " +
        s"got $maxUpMilli")
    val spark = docs.sparkSession
    val counts = Dedup.materialize(docs
      .select(col(grpCol).as("grp"),
        Bpe.encodedSize(col(textCol), merges).cast("long").as("graft_tok"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_tok")).as("tokens")))
    val rows = counts.collect()
    require(rows.nonEmpty && rows.forall(r => !r.isNullAt(2)),
      "cappedTemperatureMix: no group has a token count (empty corpus " +
        "or all-null texts) — shares are undefined")
    require(rows.length <= maxGroups,
      s"cappedTemperatureMix water-fills a driver-sized group table: " +
        s"${rows.length} groups exceed maxGroups=$maxGroups — mixes are " +
        "per-source recipes; pre-aggregate your grouping")
    val grp = rows.map(_.get(0).toString)
    val nDocs = rows.map(_.getLong(1))
    val toks = rows.map(_.getLong(2))
    val tmax = toks.max
    require(tmax > 0L, "cappedTemperatureMix: no group has a positive " +
      "token count — shares are undefined")
    // the SAME quantization as temperatureMixFromCounts, replayed in
    // driver IEEE doubles (identical bits)
    val u = toks.map { t =>
      val ratio = t.toDouble / tmax.toDouble
      val scaled = if (alpha == 0.5) math.sqrt(ratio)
        else math.pow(ratio, alpha)
      math.floor(scaled * 1e12).toLong
    }
    val rTot = toks.sum
    val uTot = u.sum
    val n = rows.length
    val capPpm = toks.map(t =>
      (BigInt(maxUpMilli) * t * 1000000L / (BigInt(1000L) * rTot)).toLong)
    val tempPpm = u.map(ui => (BigInt(1000000L) * ui / uTot).toLong)
    val capped = Array.fill(n)(false)
    var changed = true
    while (changed) {
      changed = false
      val cappedMass = (0 until n).filter(capped).map(capPpm(_)).sum
      val remaining = 1000000L - cappedMass
      val uu = (0 until n).filter(i => !capped(i)).map(u(_)).sum
      if (uu > 0L) (0 until n).foreach { i =>
        if (!capped(i) &&
            (BigInt(remaining) * u(i) / uu).toLong > capPpm(i)) {
          capped(i) = true; changed = true
        }
      }
    }
    val cappedMass = (0 until n).filter(capped).map(capPpm(_)).sum
    val remaining = 1000000L - cappedMass
    val uu = (0 until n).filter(i => !capped(i)).map(u(_)).sum
    val finalPpm = (0 until n).map { i =>
      if (capped(i)) capPpm(i)
      else (BigInt(remaining) * u(i) / uu).toLong
    }
    import spark.implicits._
    (0 until n).map { i =>
      (grp(i), nDocs(i), toks(i), tempPpm(i), capPpm(i), finalPpm(i),
        capped(i))
    }.toDF(grpCol, "n_docs", "tokens", "share_temp_ppm", "cap_ppm",
      "share_final_ppm", "capped")
      .orderBy(grpCol)
  }

  /** Assemble the final training MIX to a token budget:
    * [[temperatureMix]]'s flattened shares turned into per-source token
    * budgets (floor(share_temp · totalTokens)), then filled per source in
    * deterministic hash order — the last step of a data recipe, where
    * "sample source i with probability p_i" becomes an auditable,
    * re-buildable document list. Returns the kept rows:
    * (grpCol, idCol, tokens, cum_tokens) — a doc is kept iff the tokens
    * BEFORE it in its source's hash order leave budget headroom (so each
    * source overshoots by at most one document, never undershoots while
    * docs remain).
    *
    * Scale shape: the per-source running total is the two-phase
    * distributed prefix sum ([[tokenBudget]]'s discipline, partitioned
    * one level deeper): the 60-bit hash's top 8 bits form a bucket that
    * is MONOTONE in the hash order, phase 1 aggregates (source, bucket)
    * token totals (|sources|·256 rows — the offset window runs over
    * those), phase 2 windows WITHIN (source, bucket). No corpus-sized
    * partition ever funnels through one task, and the integer totals
    * make the two-phase sum exactly the naive one (the oracle IS the
    * naive per-source window, in DuckDB). Cost note: the corpus is
    * tokenized twice — once in the share aggregation (whose result must
    * reach the driver to become codegen'd budget literals) and once in
    * the fill pass; the same deliberate two-pass shape as
    * [[tokenBudget]]'s stats peek, chosen over caching a corpus-sized
    * tokenized frame. */
  def temperatureSample(
      docs: DataFrame, idCol: String, textCol: String, grpCol: String,
      totalTokens: Long, alpha: Double = 0.5,
      merges: Seq[(String, String)] = Nil): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive: $totalTokens")
    val shares = temperatureMix(docs, textCol, grpCol, alpha, merges)
      .select(col(grpCol).cast("string"), col("share_temp")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val base = docs.select(col(grpCol), col(idCol),
      Bpe.encodedSize(col(textCol), merges).cast("long").as("tokens"))
    temperatureFill(base, idCol, grpCol, shares, totalTokens)
  }

  /** The per-source budget FILL behind [[temperatureSample]] — shares
    * become codegen'd budget literals and each source fills in
    * deterministic hash order through the two-phase distributed prefix
    * sum (see [[temperatureSample]]'s scale notes). `base` must be
    * (grpCol, idCol, tokens); shared with
    * [[graft.ext.Bpe.temperatureSampleFromState]], whose `base` comes
    * from the persisted tokenizer sidecar instead of a tokenize pass —
    * both produce bit-identical fills from the same counts. */
  private[ext] def temperatureFill(
      base0: DataFrame, idCol: String, grpCol: String,
      shares: Array[(String, Double)], totalTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgetExpr = shares.foldLeft(lit(0L): Column) { case (acc, (g, s)) =>
      when(col(grpCol) === g,
        lit(math.floor(s * totalTokens).toLong)).otherwise(acc)
    }
    val base = base0
      .withColumn("graft_h",
        PortableHash.md5Long(col(idCol).cast("string"), "tsamp:"))
      .withColumn("graft_hb", (col("graft_h") / lit(1L << 52)).cast("long"))
    val bucketTotals = base.groupBy(col(grpCol), col("graft_hb"))
      .agg(sum(col("tokens")).as("graft_bt"))
    val wOff = Window.partitionBy(col(grpCol)).orderBy(col("graft_hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("graft_off",
        coalesce(sum(col("graft_bt")).over(wOff), lit(0L)))
      .select(col(grpCol), col("graft_hb"), col("graft_off"))
    val wIn = Window.partitionBy(col(grpCol), col("graft_hb"))
      .orderBy(col("graft_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(offsets, Seq(grpCol, "graft_hb"))
      .withColumn("graft_cum", col("graft_off") + sum(col("tokens")).over(wIn))
      .filter(col("graft_cum") - col("tokens") < budgetExpr)
      .select(col(grpCol), col(idCol), col("tokens"),
        col("graft_cum").as("cum_tokens"))
  }

  /** Split-LEAKAGE audit: join a near-dup pair relation against a split
    * assignment and count pairs per (split, split) cell — the eval-
    * integrity check run before trusting any train/test split. A pair in
    * an off-diagonal cell (`leaks = true`) is a near-duplicate straddling
    * two splits: its test half is effectively training data and every
    * metric computed on it is inflated. [[leakageFreeSplit]] produces
    * zero leaking cells BY CONSTRUCTION (both endpoints of a pair share
    * their cluster rep, hence their split); a naive per-doc hash split
    * ([[splitAssign]]) leaks roughly the cross-fraction of the pair
    * mass — this audit is the measurement that justifies the rep-keyed
    * split. Two hash joins on the (bounded) pair relation; |splits|²
    * output. */
  def splitLeakageAudit(
      pairs: DataFrame, assign: DataFrame, idCol: String,
      splitCol: String = "split"): DataFrame = {
    val a = assign.select(col(idCol).as("id_a"), col(splitCol).as("graft_sa"))
    val b = assign.select(col(idCol).as("id_b"), col(splitCol).as("graft_sb"))
    pairs.select(col("id_a"), col("id_b"))
      .join(a, "id_a").join(b, "id_b")
      .groupBy(least(col("graft_sa"), col("graft_sb")).as("split_a"),
        greatest(col("graft_sa"), col("graft_sb")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaks", col("split_a") =!= col("split_b"))
  }

  /** LEAKAGE-FREE deterministic split: assign every document the split of
    * its near-dup CLUSTER representative, so two near-duplicates can never
    * land in train and test at once — the eval-integrity property a plain
    * per-doc hash split ([[splitAssign]]) silently violates whenever the
    * corpus still contains near-dups (and at 100 TB it always does).
    *
    * Composes [[Dedup.lshComponents]] (rep per clustered doc; singletons
    * are their own rep) with the same hash-bucket assignment, keyed on the
    * REP id. Returns (idCol, rep, split). */
  def leakageFreeSplit(
      docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)],
      defaultLabel: String = "rest"): DataFrame = {
    val comp = Dedup.lshComponents(docs, idCol, textCol)
      .select(col("id").as(idCol), col("label"))
    val assigned = docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("rep"))
    splitAssign(assigned, "rep", splits, defaultLabel)
  }

  /** [[leakageFreeSplit]] when the caller ALREADY holds the near-dup pair
    * relation (the audit pattern: [[splitLeakageAudit]] needs the pairs
    * anyway, and [[Dedup.lshPairs]]' signature pass is the expensive
    * stage) — derives the cluster reps with [[Dedup.components]] directly
    * from the materialized pairs instead of re-shingling and re-signing
    * the corpus a second time through [[Dedup.lshComponents]].
    *
    * Identical assignment to [[leakageFreeSplit]] over the same corpus:
    * [[Dedup.lshPairs]] emits an intra-group pair for every exact-dup
    * group and a member-level pair for every verified rep pair, so
    * components over them have exactly [[Dedup.lshComponents]]'
    * connectivity, and both label a component with its least member id
    * (spec-pinned). Returns (idCol, rep, split). */
  def leakageFreeSplitFromPairs(
      docs: DataFrame, pairs: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      defaultLabel: String = "rest"): DataFrame = {
    val comp = Dedup.components(pairs.select(col("id_a"), col("id_b")))
      .select(col("id").as(idCol), col("label"))
    val assigned = docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("rep"))
    splitAssign(assigned, "rep", splits, defaultLabel)
  }

  /** Deterministic train/validation/test (or any n-way) split assignment:
    * the split label is a pure function of the row id, so every engine,
    * every re-run, and every retried task agrees on the assignment, and
    * growing one fraction only moves rows across adjacent splits.
    *
    * `splits` maps label → fraction; fractions must sum to ≤ 1 (a
    * remainder falls into `defaultLabel`). Thresholds are cumulative
    * integer bucket bounds (driver-rounded, see [[stratified]]).
    * Map-side `when` chain, codegen'd, zero shuffle — scan-speed.
    */
  def splitAssign(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      defaultLabel: String = "rest",
      buckets: Int = 10000): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val bucket = hashBucket(col(idCol), buckets)
    // round the CUMULATIVE fraction, not each increment: summing per-split
    // rounded values drifts (3× 1/3 at 10000 buckets → 3333+3333+3333 =
    // 9999, silently sending bucket 9999 to defaultLabel even though the
    // fractions sum to 1); the cumulative round pins the last bound to
    // round(1.0 · buckets) = buckets exactly
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.round(c * buckets))
    val assign = splits.zip(bounds).foldRight(lit(defaultLabel): Column) {
      case (((label, _), bound), acc) =>
        when(bucket < lit(bound), lit(label)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Quality-ranked token-budget selection: keep the highest-quality
    * documents whose RUNNING token total (in (qualityCol DESC, idCol ASC)
    * order) stays within `budget` — the "take the best N tokens" step of a
    * training-data recipe. Emits the kept rows plus their exact global
    * running total `cum_tokens`.
    *
    * A naive global cumulative sum is `Window.orderBy` with no partition —
    * one task scans the corpus. This is the two-phase distributed prefix
    * sum instead: quality is bucketed (`floor(quality·granularity)` — a
    * monotone function of the sort key, so bucket boundaries respect the
    * global order), phase 1 aggregates per-bucket token totals (a few
    * hundred rows — the only unpartitioned window runs over THEM), phase 2
    * computes the within-bucket running sum with a window PARTITIONED BY
    * bucket, and the global prefix is bucket-offset + within-bucket sum.
    * Token counts are integral, so the two-phase total is exactly the
    * single-scan total (the x49 oracle IS the naive global window, in
    * DuckDB). Ties inside a bucket order by id; equal quality always lands
    * in the same bucket, so the phase split never breaks the tie order. */
  def tokenBudget(
      df: DataFrame, idCol: String, tokenCol: String, qualityCol: String,
      budget: Long, granularity: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qb = floor(col(qualityCol) * granularity).cast("long")
    val withBucket = df.withColumn("graft_qb", qb)
    val bucketTotals = withBucket.groupBy(col("graft_qb"))
      .agg(sum(col(tokenCol)).as("graft_bt"))
    val wb = Window.orderBy(col("graft_qb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("graft_off", coalesce(sum(col("graft_bt")).over(wb), lit(0L)))
      .select(col("graft_qb"), col("graft_off"))
    val ww = Window.partitionBy(col("graft_qb"))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBucket.join(broadcast(offsets), Seq("graft_qb"))
      .withColumn("cum_tokens", col("graft_off") + sum(col(tokenCol)).over(ww))
      .filter(col("cum_tokens") <= budget)
      .drop("graft_qb", "graft_off")
  }
}
