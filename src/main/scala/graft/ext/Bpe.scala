package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the tokenizer-construction loop run
  * AGAINST the corpus instead of a single-machine sample (Sennrich et al.
  * 2016, arXiv:1508.07909). x73 counts merge CANDIDATES once; this trains
  * an actual merge list: repeatedly (1) count adjacent symbol pairs over
  * the whole corpus, (2) pick the most frequent pair (ties pinned:
  * count desc, then left/right symbol ascending — deterministic across
  * engines and retries), (3) re-encode every document by greedily merging
  * that pair left-to-right, then repeat on the merged symbols. Merged
  * symbols are joined with [[mergeJoin]] (U+0002), so later iterations
  * count pairs OVER merged symbols — the hierarchical vocabulary BPE exists for.
  *
  * Scale shape per iteration: the pair count is a map-side zip_with over
  * shifted slices + a hash aggregate with partial combine (x73's shape —
  * the shuffle carries the pair VOCABULARY, not the corpus), the argmax
  * is orderBy+limit(1) (TakeOrderedAndProject: one row per partition to
  * the driver), and the re-encode is a pure map (one aggregate() fold per
  * document, O(len) state transitions; the fold's array-append costs
  * O(len²) copies per doc in the worst case — bounded by document length,
  * never corpus size). Iteration state is materialized each round so
  * round k's lineage doesn't replay rounds 1..k−1's folds. The driver
  * holds `numMerges` rows of state — nothing corpus-sized.
  *
  * Production vocabularies (tens of thousands of merges) amortize
  * differently: real trainers keep incremental pair-count deltas instead
  * of recounting (each merge only changes counts adjacent to its
  * occurrences), and at 100 TB one trains on a sampled subset — both are
  * optimizations OVER this baseline, which recounts exactly and is the
  * reference semantics an incremental trainer must reproduce. */
object Bpe {

  /** Adjacent symbol pairs of a token-array column as (a, b) structs —
    * zip_with over shifted slices (map-side, codegen'd), no posexplode
    * index arithmetic. */
  private def adjacentPairs(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** Joiner inside merged symbols: U+0002, a control character that
    * cannot appear in whitespace-tokenized text — a printable joiner
    * (e.g. '+') would make a literal corpus token like "a+b" collide
    * with the merged symbol of the pair (a, b), conflating pair counts
    * on code/math corpora. Distinct from the U+0001 the ORACLE uses to
    * key (left, right) pairs, so merged symbols never confuse the
    * oracle's pair-key split, and still above U+0001 so the oracle's
    * single-key ORDER BY keeps matching the (n, left, right) order. */
  val mergeJoin = "\u0002"

  /** Greedy left-to-right application of ONE merge (a, b) → a⟨U+0002⟩b:
    * fold the token array, replacing the accumulator tail when it ends
    * with `a` and the incoming symbol is `b`. A replaced tail cannot
    * re-merge (the fold moves on), giving the standard non-overlapping
    * left-to-right semantics: a a a b → a a (a·b). */
  private def applyMerge(toks: Column, a: String, b: String): Column = {
    val merged = a + mergeJoin + b
    aggregate(toks, typedLit(Seq.empty[String]), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Train `numMerges` BPE merges over `textCol`'s whitespace tokens.
    * Returns (step, left, right, n) — the merge table in training order,
    * n the pair's corpus count at selection time. Stops early once no
    * pair occurs at least twice — a frequency-1 merge compresses nothing
    * and no BPE trainer emits one. */
  def trainMerges(
      docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    require(numMerges >= 1 && numMerges <= 64,
      "numMerges must be in [1, 64] — the training loop runs one corpus " +
        "pass per merge; train large vocabularies on a sampled corpus")
    var state = Dedup.materialize(
      docs.select(Dedup.tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) >= 2))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (step <- 1 to numMerges if !exhausted) {
      val top = state
        .select(explode(adjacentPairs(col("toks"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) exhausted = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, a, b, n))
        state = Dedup.materialize(
          state.select(applyMerge(col("toks"), a, b).as("toks")))
      }
    }
    import spark.implicits._
    merges.result().toDF("step", "left", "right", "n")
      .select(col("step").cast("long").as("step"), col("left"),
        col("right"), col("n"))
  }

  /** Re-encode `textCol` with an already-trained merge list, in training
    * order — the APPLY side of [[trainMerges]] for encoding new corpora
    * with a fixed tokenizer. Merges are applied as chained folds (one per
    * merge, all map-side, no shuffle at all). Returns the input plus a
    * `symbols` column. */
  def encode(
      docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val encoded = merges.foldLeft(Dedup.tokens(col(textCol))) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
    docs.withColumn("symbols", encoded)
  }
}
