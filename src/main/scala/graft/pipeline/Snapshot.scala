package graft.pipeline

import graft.ops.Relational
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's whole per-(user,pool) pipeline (main.py:20-351,
  * SURVEY.md §3 EP2/EP3 + transform tail) as ONE declarative DataFrame
  * program — Spark-first, not a loop port:
  *
  *  - the reference iterates (user, pool) tasks serially (main.py:11-12);
  *    here the task table drives every step, so ALL tasks flow through a
  *    single Catalyst plan and scale horizontally;
  *  - pool stats are dimension-sized → broadcast joins;
  *  - the per-event/per-bin/per-fee child tables aggregate to task
  *    granularity with one shuffle each, pre-aggregated map-side;
  *  - report column names (with % [ ] ( ) characters, main.py:293-340)
  *    are applied ONLY in the final select; everything internal uses
  *    sanitized names (SURVEY.md §7.4).
  *
  * Division semantics: pandas yields ±inf on x/0 then replaces with NaN
  * (main.py:266-269,284-286); we emit null directly (same CSV rendering:
  * empty cell).
  */
object Snapshot {

  /** All inputs at task granularity. `tasks` = (user_address,
    * pool_address) — the reference's config cross join (J5). */
  final case class Inputs(
      tasks: DataFrame,      // user_address, pool_address
      pool1d: DataFrame,     // Schemas.poolStats with filterBy='1d'
      pool1h: DataFrame,     // Schemas.poolStats with filterBy='1h'
      history: DataFrame,    // Schemas.userHistory
      fees: DataFrame,       // Schemas.feesEarned
      bins: DataFrame)       // Schemas.binReserves

  private def num(c: Column): Column = c.try_cast("double")
  private def safeDiv(n: Column, d: Column): Column = when(d =!= 0, n / d)

  /** Builds the 46-column snapshot, one row per task. Wall-clock columns
    * are injected so tests can pin them (SURVEY.md §7.4 non-determinism). */
  def build(in: Inputs, nowUnix: Column, nowStr: Column): DataFrame = {
    // ---- P1/P2: pool stats 1d, flatten + coerce (sanitized names) ----
    val p1d = in.pool1d.select(
      col("pairAddress").as("pool_address"),
      col("name").as("pool_name"),
      num(col("volumeUsd")).as("volume_1d"),
      num(col("liquidityUsd")).as("liquidity"),
      num(col("feesUsd")).as("fees_1d"),
      col("tokenX.address").as("token_x_address"),
      col("tokenY.address").as("token_y_address"),
      col("tokenX.symbol").as("token_x_symbol"),
      col("tokenY.symbol").as("token_y_symbol"),
      col("tokenX.decimals").try_cast("int").as("token_x_decimals"),
      col("tokenY.decimals").try_cast("int").as("token_y_decimals"),
      num(col("reserveX")).as("pool_token_x_amount"),
      num(col("reserveY")).as("pool_token_y_amount"),
      num(col("tokenX.priceUsd")).as("token_x_price"),
      num(col("tokenY.priceUsd")).as("token_y_price"),
      col("lbBinStep").try_cast("int").as("lbBinStep"),
      num(col("lbBaseFeePct")).as("base_fee_pct"),
      num(col("lbMaxFeePct")).as("max_fee_pct"),
      num(col("protocolSharePct")).as("protocol_fee_pct"),
      col("activeBinId").try_cast("int").as("activeBinId"),
      num(col("liquidityDepthMinus")).as("liq_depth_minus_usd"),
      num(col("liquidityDepthPlus")).as("liq_depth_plus_usd"),
      num(col("liquidityDepthTokenX")).as("liq_depth_token_x"),
      num(col("liquidityDepthTokenY")).as("liq_depth_token_y"))

    // ---- P3/J3: 1h window stats (horizontal concat → keyed join) ----
    val p1h = in.pool1h.select(
      col("pairAddress").as("pool_address"),
      num(col("volumeUsd")).as("volume_1h"),
      num(col("feesUsd")).as("fees_1h"))

    // ---- P4/P7/P8 + F1 + A1/A2: history → latest-deposit summary ----
    val hist = in.history.select(
      col("user_address"),
      col("poolAddress").as("pool_address"),
      to_timestamp(col("timestamp")).as("ts"),
      col("isDeposit"),
      col("blockNumber"),
      coalesce(num(col("tokenX.amount")), lit(0.0)).as("tokenX_amount"),
      coalesce(num(col("tokenY.amount")), lit(0.0)).as("tokenY_amount"))
    val deposits = hist.filter(col("isDeposit") === true)
    val latest = Relational.latestByKey(
      deposits, Seq(col("user_address"), col("pool_address")),
      Seq(col("blockNumber"), col("ts")))
    val histSummary = latest
      .groupBy(col("user_address"), col("pool_address"))
      .agg(
        sum(col("tokenX_amount").cast(DecimalType(38, 6))).cast("double")
          .as("total_tokenX_amount_initial_deposit"),
        sum(col("tokenY_amount").cast(DecimalType(38, 6))).cast("double")
          .as("total_tokenY_amount_initial_deposit"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("MostRecentDepositTime"))

    // ---- A4/A5: fee fold per task ----
    val fees = in.fees.select(
      col("user_address"),
      col("poolAddress").as("pool_address"),
      col("binId").try_cast("long").as("binId"),
      coalesce(num(col("accruedFeesX")), lit(0.0)).as("fx"),
      coalesce(num(col("accruedFeesY")), lit(0.0)).as("fy"))
    val feeSummary = fees
      .groupBy(col("user_address"), col("pool_address"))
      .agg(
        Relational.stringFold(
          struct(col("binId"), col("fx"), col("fy")),
          x => format_string("%s: %s, %s",
            x.getField("binId").cast("string"),
            x.getField("fx").cast("string"),
            x.getField("fy").cast("string"))).as("fees_per_bin"),
        sum(col("fx").cast(DecimalType(38, 12))).cast("double").as("accrued_fees_token_x"),
        sum(col("fy").cast(DecimalType(38, 12))).cast("double").as("accrued_fees_token_y"))

    // ---- E2-E4 + A5: on-chain bin math per task (S7 tail) ----
    // exact unbounded product then one rounding to double — Python's
    // `reserveX * shares / total_shares` (arbitrary-precision int*int,
    // then true division to float, main.py:232-233). BinMath.mulDiv
    // multiplies on java BigDecimal, so uint128-scale reserves/shares
    // (products beyond Decimal(38,0)'s 38-digit cap) stay exact instead
    // of overflowing to null; totalShares=0 yields null (engine policy).
    val binCalc = in.bins
      .join(p1d.select(col("pool_address"), col("token_x_decimals"),
                       col("token_y_decimals")),
            col("poolAddress") === col("pool_address"))
      .select(
        col("user_address"), col("pool_address"), col("binId"),
        graft.functions.BinMath.mulDivDouble(
          col("reserveX"), col("shares"), col("totalShares")).as("user_x_raw"),
        graft.functions.BinMath.mulDivDouble(
          col("reserveY"), col("shares"), col("totalShares")).as("user_y_raw"),
        pow(lit(10.0), col("token_x_decimals")).as("scale_x"),
        pow(lit(10.0), col("token_y_decimals")).as("scale_y"))
    val binSummary = binCalc
      .groupBy(col("user_address"), col("pool_address"))
      .agg(
        Relational.stringFold(
          struct(col("binId"),
                 (col("user_x_raw") / col("scale_x")).as("bx"),
                 (col("user_y_raw") / col("scale_y")).as("by")),
          x => format_string("%s: %s, %s",
            x.getField("binId").cast("string"),
            x.getField("bx").cast("string"),
            x.getField("by").cast("string"))).as("bin_distribution"),
        (sum(col("user_x_raw")) / first(col("scale_x"))).as("token_x_amount"),
        (sum(col("user_y_raw")) / first(col("scale_y"))).as("token_y_amount"))

    // ---- J1/J2/J5: task table ⟕ dimensions (all broadcast-sized) ----
    val joined = in.tasks
      .join(broadcast(p1d), Seq("pool_address"), "left")
      .join(broadcast(p1h), Seq("pool_address"), "left")
      .join(histSummary, Seq("user_address", "pool_address"), "left")
      .join(feeSummary, Seq("user_address", "pool_address"), "left")
      .join(binSummary, Seq("user_address", "pool_address"), "left")
      // F5: aggregate-or-default — the reference always materializes the
      // summary frames, with zero totals and "()" blobs when the source
      // arrays are empty (main.py:143-153, 158-181, 227-250)
      .withColumn("total_tokenX_amount_initial_deposit",
        coalesce(col("total_tokenX_amount_initial_deposit"), lit(0.0)))
      .withColumn("total_tokenY_amount_initial_deposit",
        coalesce(col("total_tokenY_amount_initial_deposit"), lit(0.0)))
      .withColumn("accrued_fees_token_x", coalesce(col("accrued_fees_token_x"), lit(0.0)))
      .withColumn("accrued_fees_token_y", coalesce(col("accrued_fees_token_y"), lit(0.0)))
      .withColumn("fees_per_bin", coalesce(col("fees_per_bin"), lit("()")))
      .withColumn("bin_distribution", coalesce(col("bin_distribution"), lit("()")))
      .withColumn("token_x_amount", coalesce(col("token_x_amount"), lit(0.0)))
      .withColumn("token_y_amount", coalesce(col("token_y_amount"), lit(0.0)))

    // ---- E1, E5-E13: derived metrics ----
    val metrics = joined
      .withColumn("value_if_held_usd",
        col("total_tokenX_amount_initial_deposit") * col("token_x_price") +
        col("total_tokenY_amount_initial_deposit") * col("token_y_price"))
      .withColumn("token_x_usd", col("token_x_price") * col("token_x_amount"))
      .withColumn("token_y_usd", col("token_y_price") * col("token_y_amount"))
      .withColumn("total_token_value_usd", col("token_x_usd") + col("token_y_usd"))
      .withColumn("accrued_fees_token_x_usd",
        col("accrued_fees_token_x") * col("token_x_price"))
      .withColumn("accrued_fees_token_y_usd",
        col("accrued_fees_token_y") * col("token_y_price"))
      .withColumn("impermanent_loss_usd",
        col("value_if_held_usd") - col("total_token_value_usd"))
      .withColumn("user_pct_of_pool_liquidity",
        safeDiv(col("total_token_value_usd"), col("liquidity")) * 100)
      .withColumn("fees_annual", col("fees_1d") * 365)
      .withColumn("apr_pct", safeDiv(col("fees_annual"), col("liquidity")) * 100)
      .withColumn("apy_pct",
        when(col("liquidity") =!= 0,
          (pow(lit(1.0) + col("fees_1d") / col("liquidity"), 365) - 1) * 100))
      .withColumn("apr_1d_pct", safeDiv(col("fees_1d"), col("liquidity")) * 100)
      .withColumn("current_unix_timestamp", nowUnix)
      .withColumn("timestamp_now", nowStr)

    // ---- P5/P6: report names + canonical 46-column order, tolerant ----
    val order: Seq[(String, String)] = Seq(
      "current_unix_timestamp" -> "current_unix_timestamp",
      "timestamp_now" -> "timestamp(datetime_pst)",
      "pool_name" -> "pool_name",
      "pool_address" -> "pool_address",
      "volume_1h" -> "pool[volume](1h)",
      "liquidity" -> "pool[liquidity]",
      "fees_1h" -> "pool[total_fees(USD)](1h)",
      "lbBinStep" -> "lbBinStep",
      "base_fee_pct" -> "base_fee%",
      "max_fee_pct" -> "max_fee%",
      "protocol_fee_pct" -> "protocol_fee%",
      "token_x_symbol" -> "token_x_symbol",
      "token_y_symbol" -> "token_y_symbol",
      "token_x_address" -> "token_x_address",
      "token_y_address" -> "token_y_address",
      "pool_token_x_amount" -> "pool[token_x_amount]",
      "pool_token_y_amount" -> "pool[token_y_amount]",
      "token_x_price" -> "token_x_price",
      "token_y_price" -> "token_y_price",
      "activeBinId" -> "activeBinId",
      "liq_depth_token_x" -> "liquidityDepth+2%TokenX",
      "liq_depth_token_y" -> "liquidityDepth-2%TokenY",
      "liq_depth_plus_usd" -> "liquidityDepth+2%(USD)",
      "liq_depth_minus_usd" -> "liquidityDepth-2%(USD)",
      "user_address" -> "user_address",
      "total_tokenX_amount_initial_deposit" -> "total_tokenX_amount_initial_deposit",
      "total_tokenY_amount_initial_deposit" -> "total_tokenY_amount_initial_deposit",
      "MostRecentDepositTime" -> "MostRecentDepositTime",
      "token_x_amount" -> "token_x_amount",
      "token_y_amount" -> "token_y_amount",
      "token_x_usd" -> "token_x(USD)",
      "token_y_usd" -> "token_y(USD)",
      "bin_distribution" -> "bin_distribution(bin id: token_x_amount, token_y_amounts)",
      "total_token_value_usd" -> "total_token_value(USD)",
      "accrued_fees_token_x" -> "accrued_fees_token_x",
      "accrued_fees_token_y" -> "accrued_fees_token_y",
      "accrued_fees_token_x_usd" -> "accrued_fees_token_x(USD)",
      "accrued_fees_token_y_usd" -> "accrued_fees_token_y(USD)",
      "fees_per_bin" -> "fees_per_bin(bin_id: token_x, token_y_amounts)",
      "value_if_held_usd" -> "value_if_held(USD)",
      "impermanent_loss_usd" -> "impermanent_loss(USD)",
      "user_pct_of_pool_liquidity" -> "user_%_of_pool_liquidity",
      "fees_annual" -> "fees_annual",
      "apr_pct" -> "APR%",
      "apy_pct" -> "APY%",
      "apr_1d_pct" -> "APR_1d%")
    Relational.tolerantSelect(metrics, order)
  }
}
