package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference-shaped payloads (FIXTURES.md §B).
  * Numeric-ish API fields are declared STRING on purpose: the reference's
  * APIs "may return numbers as strings" and the pipeline re-coerces
  * column-by-column (main.py:125-126,195-196,221-222 — SURVEY.md P7);
  * reading as string + try_cast reproduces that tolerance exactly.
  */
object Schemas {

  private def tokenStruct = StructType(Seq(
    StructField("address", StringType),
    StructField("symbol", StringType),
    StructField("decimals", StringType),
    StructField("priceUsd", StringType)))

  /** Pool stats payload (main.py:51-100), one object per (pool, filterBy). */
  val poolStats: StructType = StructType(Seq(
    StructField("pairAddress", StringType),
    StructField("name", StringType),
    StructField("filterBy", StringType),
    StructField("volumeUsd", StringType),
    StructField("liquidityUsd", StringType),
    StructField("feesUsd", StringType),
    StructField("reserveX", StringType),
    StructField("reserveY", StringType),
    StructField("lbBinStep", StringType),
    StructField("lbBaseFeePct", StringType),
    StructField("lbMaxFeePct", StringType),
    StructField("protocolSharePct", StringType),
    StructField("activeBinId", StringType),
    StructField("liquidityDepthMinus", StringType),
    StructField("liquidityDepthPlus", StringType),
    StructField("liquidityDepthTokenX", StringType),
    StructField("liquidityDepthTokenY", StringType),
    StructField("tokenX", tokenStruct),
    StructField("tokenY", tokenStruct)))

  /** User position-history event (main.py:104-127). */
  val userHistory: StructType = StructType(Seq(
    StructField("user_address", StringType),
    StructField("timestamp", StringType),
    StructField("isDeposit", BooleanType),
    StructField("poolAddress", StringType),
    StructField("pairName", StringType),
    StructField("binId", StringType),
    StructField("blockNumber", LongType),
    StructField("tokenX", StructType(Seq(
      StructField("amount", StringType), StructField("price", StringType)))),
    StructField("tokenY", StructType(Seq(
      StructField("amount", StringType), StructField("price", StringType))))))

  /** Fees-earned entry (main.py:155-170). */
  val feesEarned: StructType = StructType(Seq(
    StructField("user_address", StringType),
    StructField("poolAddress", StringType),
    StructField("binId", StringType),
    StructField("accruedFeesX", StringType),
    StructField("accruedFeesY", StringType)))

  /** On-chain bin reserve tuple (helperContractABI.json:230-258,
    * main.py:216-244). Decimal(38,0) holds the uint128 reserves/shares
    * the fixtures use. */
  val binReserves: StructType = StructType(Seq(
    StructField("user_address", StringType),
    StructField("poolAddress", StringType),
    StructField("binId", LongType),
    StructField("reserveX", DecimalType(38, 0)),
    StructField("reserveY", DecimalType(38, 0)),
    StructField("shares", DecimalType(38, 0)),
    StructField("totalShares", DecimalType(38, 0))))
}
