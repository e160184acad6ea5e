package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{MisraGriesAgg, TextAnalysis}

/** Exact corpus-wide heavy hitters at sketch cost.
  *
  * The naive "which tokens make up >= phi of all token occurrences" is
  * `groupBy(token).count()` — a shuffle with one key per DISTINCT token,
  * which at 100 TB is billions of keys mostly counting to 1. Two phases
  * make the answer exact while shuffling almost nothing:
  *
  *   1. a Misra-Gries summary (capacity ceil(2/phi), merged through normal
  *      partial aggregation) yields a candidate set PROVABLY containing
  *      every token with frequency > N/capacity <= phi*N/2 — a strict
  *      superset of the answer;
  *   2. the candidates (at most capacity rows) broadcast back over the
  *      token stream and ONLY they are exactly counted — the second
  *      shuffle carries at most `capacity` distinct keys.
  *
  * No driver action: the one-row sketch result rides as a broadcast frame,
  * so the whole thing is one lazy plan. Output (token, n) with
  * n >= ceil(phi * N), descending — exact and oracle-checkable against a
  * plain GROUP BY / HAVING.
  */
object HeavyHitters {

  /** Tokens making up at least `phi` of all token occurrences in
    * `textCol`, with their EXACT counts. `phi` in (0, 1); capacity
    * ceil(2/phi) is capped at 1M entries (phi >= 2e-6). */
  def frequentTokens(df: DataFrame, textCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0, 1), got $phi")
    val capacity = math.ceil(2.0 / phi).toInt
    val terms = df.select(
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    frequentValues(terms, "token", phi, capacity)
  }

  /** Same contract over an arbitrary string column (URLs, hosts, ids). */
  def frequentValues(values: DataFrame, valueCol: String, phi: Double,
                     capacity: Int): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0, 1), got $phi")
    // completeness needs every qualifying value to survive the sketch:
    // f >= ceil(phi*N) > N/capacity requires capacity > 1/phi; 2/phi gives
    // a whole factor of slack so merge-time decrements can never graze the
    // boundary
    require(capacity >= math.ceil(2.0 / phi).toInt,
      s"capacity $capacity too small for phi=$phi (need >= ceil(2/phi))")
    // "n" and "n_total" are this operator's output/working column names;
    // n_total also rides the broadcast candidates frame back through a join
    // with the FULL caller frame, so ANY input column with that name would
    // turn into an ambiguous reference — refuse loudly (repo-wide pattern)
    require(valueCol != "n" && valueCol != "cands",
      s"valueCol '$valueCol' collides with a reserved output column; rename it first")
    require(!values.columns.contains("n_total"),
      "input already has an 'n_total' column — rename it before frequentValues")
    val mg = udaf(new MisraGriesAgg(capacity), Encoders.STRING)
    val vcol = col(valueCol)
    // one pass: MG candidate summary + exact N, partial-agg mergeable
    val sketch = values.agg(
      mg(vcol).as("cands"), count(vcol).as("n_total"))
    val cands = sketch.select(
      explode(map_keys(col("cands"))).as(valueCol), col("n_total"))
    // exact pass over candidates only: broadcast join keeps the big side
    // shuffle keyed by at most `capacity` distinct values
    values.join(broadcast(cands), valueCol)
      .groupBy(vcol, col("n_total"))
      .agg(count(lit(1)).as("n"))
      // epsilon absorbs float rounding when phi*N is mathematically an
      // integer (0.1*30 = 3.0000000000000004 would otherwise ceil to 4 and
      // drop a boundary heavy hitter); any count within 1e-9 of an integer
      // threshold is treated as meeting it (the oracle SQL mirrors this)
      .filter(col("n") >= ceil(lit(phi) * col("n_total") - lit(1e-9)))
      .select(vcol, col("n"))
  }
}
