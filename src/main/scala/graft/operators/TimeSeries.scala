package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair over keyed observations: densify each
  * key's ordinate range and carry the last observation forward — the
  * resample-and-ffill step between raw event rollups and any model that
  * assumes one row per (key, period). Complements [[AsOfJoin]] (which
  * aligns TWO frames; this regularizes ONE).
  */
object TimeSeries {

  /** Densify to one row per (key, ord) for every integral `ordCol` step in
    * each key's [min, max] observed range, and forward-fill `valueCols`
    * (last non-null at or before each step). Emits `observed` marking real
    * input rows; gap rows carry the filled values. Input must be unique per
    * (key, ord) — duplicate ordinates make the fill order undefined.
    *
    * Leading rows are always observed (the scaffold starts at each key's
    * first observation), so filled values are never null.
    *
    * Scale shape: TWO key shuffles — one aggregate computing each key's gap
    * list in place (`array_except(sequence(min, max), collect_list(ord))`,
    * exploded key-locally; the per-key array is bounded by the ordinate
    * SPAN, e.g. days of history, not by row count), and one window for the
    * running fill. No scaffold join: gap rows union in with null values.
    */
  def forwardFill(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "forwardFill needs at least one value column")
    val key = keyCols.map(col)
    val missing = df.groupBy(key: _*)
      .agg(array_except(
        sequence(min(col(ordCol)), max(col(ordCol))),
        collect_list(col(ordCol))).as("__gaps"))
      .select((key :+ explode(col("__gaps")).as(ordCol)): _*)
      .withColumn("observed", lit(false))
    val unioned = df.withColumn("observed", lit(true))
      .unionByName(missing, allowMissingColumns = true)
    val w = Window.partitionBy(key: _*).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(unioned) { (d, v) =>
      d.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
  }

  /** [[forwardFill]]'s linear sibling: densify each key's ordinate range and
    * LERP gap values between the surrounding observations —
    * `prev + (next − prev) · (ord − prevOrd)/(nextOrd − prevOrd)` — the
    * resample step for quantities that drift rather than hold (rates,
    * gauges). Same scaffold contract: unique (key, ord) input, non-null
    * observed values; every gap row sits strictly between two observations
    * (the scaffold spans each key's own [min, max]), so the interpolant is
    * always defined. Determinism: one fixed-order IEEE multiply-add chain
    * on inputs both engines derive identically.
    *
    * Scale shape: the same TWO key shuffles as forwardFill — the gap-list
    * aggregate, then ONE window partitioning whose ascending sort serves
    * both the backward (last observed) and forward (next observed) frames.
    */
  def interpolate(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCol: String): DataFrame = {
    val key = keyCols.map(col)
    val missing = df.groupBy(key: _*)
      .agg(array_except(
        sequence(min(col(ordCol)), max(col(ordCol))),
        collect_list(col(ordCol))).as("__gaps"))
      .select((key :+ explode(col("__gaps")).as(ordCol)): _*)
      .withColumn("observed", lit(false))
    val unioned = df.withColumn("observed", lit(true))
      .unionByName(missing, allowMissingColumns = true)
    val w = Window.partitionBy(key: _*).orderBy(col(ordCol))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsOrd = when(col("observed"), col(ordCol))
    unioned
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("__po", last(obsOrd, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("__no", first(obsOrd, ignoreNulls = true).over(fwd))
      .withColumn(valueCol,
        when(col("observed"), col(valueCol))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col(ordCol) - col("__po")).cast("double") /
              (col("__no") - col("__po")).cast("double"))))
      .drop("__pv", "__po", "__nv", "__no")
  }

  /** CUSUM level-shift detection (Page 1954) over a keyed integer series —
    * the drift/changepoint monitor a pipeline runs over its daily volume,
    * revenue, or ingest counts: the one-sided cumulative sum
    * `s_i = max(0, s_{i-1} + dev_i)` rises when the series runs above its
    * per-key mean and resets to 0 below it; a sustained level shift makes
    * it grow linearly while isolated spikes wash out — the standard
    * sequential changepoint statistic.
    *
    * ALL-INTEGER FORM (engine-exact, no float anywhere): deviations are
    * scaled by the key's row count — `dev_i = n·x_i − total` (exact longs;
    * dividing for a mean would leave engine-specific DECIMAL rounding) —
    * and the sequential recurrence is replaced by the prefix-min identity
    * `s_i = P_i − min(0, min_{j≤i} P_j)` with `P` the running deviation
    * sum: two frames of the SAME keyed window, no per-row loop. The alarm
    * `s_i·denom > num·total·n` states "cusum exceeds (num/denom)·mean·n"
    * in pure integer arithmetic — meaningful for the POSITIVE series
    * (volume, revenue, counts) this monitors; a key whose total is ≤ 0
    * inverts the threshold's sense, so center or shift such series first.
    *
    * Scale shape: one keyed aggregate for (n, total) broadcast back onto
    * the series, then one window PARTITIONED BY the key (series length per
    * key is the ordinate span — days — never row count). Input must be one
    * row per (key, ord). */
  def cusumShift(
      series: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCol: String,
      alarmNum: Long,
      alarmDenom: Long): DataFrame = {
    require(keyCols.nonEmpty, "cusumShift needs at least one key column")
    require(alarmNum >= 0 && alarmDenom > 0,
      s"alarm fraction must be >= 0 with a positive denominator " +
        s"(got $alarmNum/$alarmDenom)")
    val totals = series.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__total"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .join(broadcast(totals), keyCols)
      .withColumn("dev", col("__n") * col(valueCol) - col("__total"))
      .withColumn("__p", sum(col("dev")).over(run))
      .withColumn("cusum",
        col("__p") - least(lit(0L), min(col("__p")).over(run)))
      .withColumn("alarm",
        col("cusum") * alarmDenom > lit(alarmNum) * col("__total") * col("__n"))
      .drop("__n", "__total", "__p")
  }

  /** EWMA DEVIATION MONITOR over a keyed integer series — [[cusumShift]]'s
    * recency-weighted sibling: each point is compared against the
    * exponentially-weighted mean of its `lags` PREDECESSORS (a spike
    * against yesterday-ish levels alarms immediately; cusum needs the
    * shift to persist). Weights are powers of two over a FIXED lag window
    * (w_i = 2^(lags−i) for lag i, most recent heaviest — the truncated
    * EWMA every monitoring system actually evaluates), so the weighted sum
    * `S = Σ w_i·x_{t−i}` is exact 64-bit integer arithmetic and the alarm
    * `|x·D − S|·denom > num·S` (D = 2^lags − 1) states "the point deviates
    * from its EWMA level by more than num/denom of it" in pure integer
    * compares — engine-exact end-to-end, like cusum. The `ewma` column
    * (S/D) is ONE IEEE division of exact integers, for humans. Points with
    * fewer than `lags` predecessors emit NULL ewma/dev/alarm (undefined,
    * not false). Meaningful for POSITIVE series (volume, revenue, counts);
    * input must be one non-null row per (key, ord).
    *
    * Scale shape: ONE window partitioned by the key (per-key series length
    * is the ordinate span — days — never row count); the lag chain is a
    * single window pass. */
  def ewmaDeviation(
      series: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCol: String,
      lags: Int,
      alarmNum: Long,
      alarmDenom: Long): DataFrame = {
    require(keyCols.nonEmpty, "ewmaDeviation needs at least one key column")
    require(lags >= 1 && lags <= 32,
      s"lags must be in [1, 32] so 2^lags stays exact (got $lags)")
    require(alarmNum >= 0 && alarmDenom > 0,
      s"alarm fraction must be >= 0 with a positive denominator " +
        s"(got $alarmNum/$alarmDenom)")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
    val weighted = (1 to lags)
      .map(i => lag(col(valueCol), i).over(w) * lit(1L << (lags - i)))
      .reduce(_ + _)
    val denom = (1L << lags) - 1L
    series
      // the deepest lag existing implies the whole window exists (row lags)
      .withColumn("__s",
        when(lag(col(valueCol), lags).over(w).isNotNull, weighted))
      .withColumn("ewma", col("__s").cast("double") / lit(denom.toDouble))
      .withColumn("dev", col(valueCol) * denom - col("__s"))
      .withColumn("alarm",
        abs(col("dev")) * alarmDenom > lit(alarmNum) * col("__s"))
      .drop("__s")
  }

  /** SEASONAL-NAIVE DEVIATION MONITOR — the monitoring-shelf member that
    * ACTS on a detected period: each point is compared to the value
    * exactly one `period` back in ORDINATE units (the seasonal-naive
    * baseline, forecast(t) = x_{t−period}) — the right monitor once
    * [[autocorrelation]] has shown the series seasonal: a weekly-cyclic
    * series alarms every peak day under [[ewmaDeviation]]'s recency level,
    * while against the same weekday one week back it alarms only on real
    * change. ALL-INTEGER like its siblings: `baseline` and
    * `dev = x_t − x_{t−period}` are exact longs, and the alarm
    * `|dev|·denom > num·baseline` states "the point moved by more than
    * num/denom of its seasonal baseline" in pure integer compares —
    * engine-exact end-to-end. GAP semantics: the baseline exists iff the
    * row at exactly ord−period exists (a RANGE frame pinned to that
    * single offset — never a row-lag, which would slide across gaps and
    * compare against the wrong weekday); rows with no baseline emit NULL
    * baseline/dev/alarm (undefined, not false — the [[ewmaDeviation]]
    * partial-window contract). Meaningful for POSITIVE series: a
    * baseline ≤ 0 inverts the threshold's sense (the [[cusumShift]]
    * caveat) and baseline = 0 alarms on any nonzero change.
    *
    * Scale shape: ONE window partitioned by the key (per-key series
    * length is the ordinate span — days — never row count); no self-join,
    * no second shuffle. Input must be one non-null row per (key, ord)
    * with an integer value column. */
  def seasonalDeviation(
      series: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCol: String,
      period: Int,
      alarmNum: Long,
      alarmDenom: Long): DataFrame = {
    require(keyCols.nonEmpty,
      "seasonalDeviation needs at least one key column")
    require(period >= 1, s"period must be >= 1 (got $period)")
    require(alarmNum >= 0 && alarmDenom > 0,
      s"alarm fraction must be >= 0 with a positive denominator " +
        s"(got $alarmNum/$alarmDenom)")
    // the frame holds AT MOST the one row at ord−period (input is unique
    // per (key, ord)), so max() is "the value there, if present"
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
      .rangeBetween(-period.toLong, -period.toLong)
    series
      .withColumn("baseline", max(col(valueCol)).over(w))
      .withColumn("dev", col(valueCol) - col("baseline"))
      .withColumn("alarm",
        abs(col("dev")) * alarmDenom > lit(alarmNum) * col("baseline"))
  }

  /** LAG-k AUTOCORRELATION per key — the seasonality/persistence probe
    * beside [[cusumShift]] (level shifts) and [[ewmaDeviation]] (spikes):
    * a weekly-cyclic ingest series shows acf(7) near 1, a level series
    * near 0 — the number a pipeline checks before trusting "day-over-day
    * deltas" style monitors. Sample ACF with the standard full-series
    * mean/denominator:
    *
    *   acf_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    *
    * EXACT FORM: deviations are scaled by n (the [[cusumShift]] trick:
    * dev = n·x − total, exact longs), products and sums ride
    * DECIMAL(38,0) — n·x up to ~10⁹·10⁹ squares past 2⁶³, and DECIMAL
    * keeps the cross-engine comparison exact where HUGEINT/long128
    * internals would differ. The n² scaling cancels in the ratio, so the
    * `acf` column is the division of the two exact decimals, rounded to
    * 9dp (the q146 policy — decimal→double casts are correctly rounded in
    * both engines, but the belt-and-braces rounding pins the artifact).
    * Keys with zero variance or no lag-k pair emit NULL acf (undefined,
    * not 0); the exact numerator/denominator columns ship alongside so
    * the gate compares integers, not floats. Exact while the scaled
    * deviation squares and their sums fit DECIMAL(38,0) — roughly
    * n·|x| < 10¹⁹ per term; beyond that the operator fails LOUDLY (a
    * product-count + NULL-total guard, the [[GraphStats.modularity]]
    * documented-bound discipline) instead of letting a non-ANSI NULL
    * read as zero variance.
    *
    * Scale shape: one keyed aggregate for (n, total), one keyed window-
    * free SELF-JOIN on (key, ord = ord + lag) — an equi-join, never a
    * range scan — and two map-side-combined rollups. Input must be one
    * row per (key, ord) with an integer value column. Lag is in ORDINATE
    * units (missing days break pairs rather than sliding over them — gap
    * semantics; [[gapFill]] first for calendar-dense series). */
  def autocorrelation(
      series: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCol: String,
      lag: Int): DataFrame = {
    require(keyCols.nonEmpty, "autocorrelation needs at least one key column")
    require(lag >= 1, s"lag must be >= 1 (got $lag)")
    val keys = keyCols.map(col)
    val totals = series.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_days"), sum(col(valueCol)).as("__total"))
    val dev = series
      .join(broadcast(totals), keyCols)
      .select(keys :+ col(ordCol).as("__o") :+ col("n_days") :+
        (col("n_days").cast("decimal(38,0)") *
          col(valueCol).cast("decimal(38,0)") -
          col("__total").cast("decimal(38,0)")).as("__dev"): _*)
    // LOUD OVERFLOW CONTRACT: under non-ANSI evaluation a >38-digit
    // DECIMAL product/sum silently yields NULL — and sum() SKIPS per-row
    // NULL products, which would misreport a wrong non-null total, not
    // even a NULL one. Count the products beside the rows: any mismatch
    // (per-row overflow or NULL input values) or a NULL total (sum
    // overflow) fails the job instead of reading as zero-variance NULL.
    val den = dev.groupBy(keys: _*)
      .agg(first(col("n_days")).as("n_days"),
        count(lit(1)).as("__n_all"),
        count(col("__dev") * col("__dev")).as("__n_prod"),
        sum(col("__dev") * col("__dev")).as("acf_den"))
    val pairs = dev.select(keys :+ col("__o") :+ col("__dev").as("__da"): _*)
      .join(dev.select(keys :+ (col("__o") - lag).as("__o") :+
          col("__dev").as("__db"): _*),
        keyCols :+ "__o")
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_pairs"),
        count(col("__da") * col("__db")).as("__n_prod_p"),
        sum(col("__da") * col("__db")).as("acf_num"))
    val overflowMsg = "autocorrelation: DECIMAL(38,0) overflow (or NULL " +
      "value-column input) in the n-scaled deviation products — the " +
      "exactness contract cannot hold; pre-scale the values or shorten " +
      "the series"
    den.join(pairs, keyCols, "left_outer")
      .select(keys :+ col("n_days") :+
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs") :+
        when(col("n_pairs").isNull, lit(0L).cast("decimal(38,0)"))
          .when(col("n_pairs") === col("__n_prod_p") &&
            col("acf_num").isNotNull, col("acf_num"))
          .otherwise(raise_error(lit(overflowMsg))).as("acf_num") :+
        when(col("__n_all") === col("__n_prod") &&
            col("acf_den").isNotNull, col("acf_den"))
          .otherwise(raise_error(lit(overflowMsg))).as("acf_den") :+
        when(col("acf_den") > 0 && col("n_pairs") > 0,
          round(col("acf_num").cast("double") /
            col("acf_den").cast("double"), 9)).as("acf"): _*)
  }
}
