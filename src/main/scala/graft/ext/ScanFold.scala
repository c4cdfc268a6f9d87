package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Keyed sequential scan-fold: the per-key running state updates that are
  * NOT associative and therefore cannot be a window aggregate at all —
  * the canonical case being a clamped (saturating) running sum, where
  * `clamp(clamp(a+b)+c) != clamp(a+b+c)`: an inventory balance that
  * floors at zero, a credit wallet that caps at a limit, a rate-limiter
  * token bucket. `SUM(...) OVER (...)` computes the UNclamped prefix and
  * clamping afterwards is simply a different (wrong) function, so no
  * composition of built-in window frames expresses this; the reference's
  * pandas plane would write it as a Python loop per group.
  *
  * Execution shape (SURVEY.md §2.12 tier (d), deliberately): ONE hash
  * exchange on the key, a within-partition sort on (key, order), then a
  * single forward pass with O(1) state per key — `mapPartitions` is the
  * documented last resort, and a sequential dependence from each row to
  * its predecessor is exactly the case that earns it (contrast
  * [[ShardedPrefix]], whose PLAIN prefix sums stay declarative because
  * addition associates and shard bases can be pre-aggregated; a clamped
  * fold has no such decomposition — saturation at a bound erases state
  * in a data-dependent way no per-shard summary can reconstruct).
  * At 100 TB this scales like any keyed shuffle: each key's history
  * streams through one task in sorted order with constant memory; the
  * spill path is Spark's own sort machinery, and hot keys are bounded by
  * per-user event volume (millions of rows per user stream fine — the
  * pass is O(n) with no buffering).
  *
  * Determinism: pure integer arithmetic (callers scale doubles to
  * integer micros first — SURVEY.md §5's exact-sum recipe), total order
  * via the caller's unique tiebreak column, saturation bounds checked
  * for headroom so `bal + d` cannot overflow.
  */
object ScanFold {

  // NOT private: Encoders codegen object-constructor access from
  // generated classes, which cannot see private members
  case class ScanRow(k: Long, o1: Long, o2: Long, d: Long)
  case class BalRow(k: Long, o1: Long, o2: Long, bal: Long)
  case class DScanRow(k: Long, o1: Long, o2: Long, x: Double)
  case class DOutRow(k: Long, o1: Long, o2: Long, s: Double)
  case class SScanRow(k: String, o1: Long, o2: Long, d: Long)
  case class SBalRow(k: String, o1: Long, o2: Long, bal: Long)
  case class HoltRow(k: Long, o1: Long, o2: Long, level: Double, trend: Double)
  case class HwRow(k: Long, o1: Long, o2: Long,
                   level: Double, trend: Double, seasonal: Double,
                   forecast: Double)

  /** Saturating running sum per key: rows of `df` are folded in
    * `(key, ord1, ord2)` order with `bal := min(hi, max(lo, bal + delta))`,
    * starting from `clamp(0)`. All four columns must be (castable to)
    * integral; `(key, ord1, ord2)` must be unique for a total order.
    * Returns one row per input row: `(key, ord1, ord2, bal)` with the
    * caller's column names preserved.
    */
  def clampedRunningSum(df: DataFrame, key: String, ord1: String, ord2: String,
                        delta: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"lo=$lo must be <= hi=$hi")
    // headroom so bal + d stays in Long for any |d| <= 2^61
    require(lo > -(1L << 61) && hi < (1L << 61),
      s"bounds [$lo,$hi] leave no overflow headroom")
    val spark = df.sparkSession
    import spark.implicits._
    val start = math.min(hi, math.max(lo, 0L))
    val ds: Dataset[ScanRow] = df.select(
        col(key).cast(LongType).as("k"),
        col(ord1).cast(LongType).as("o1"),
        col(ord2).cast(LongType).as("o2"),
        col(delta).cast(LongType).as("d"))
      .as[ScanRow]
    ds.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var started = false
        var bal = start
        it.map { r =>
          if (!started || r.k != cur) { cur = r.k; started = true; bal = start }
          bal = math.min(hi, math.max(lo, bal + r.d))
          BalRow(r.k, r.o1, r.o2, bal)
        }
      }
      .toDF(key, ord1, ord2, "bal")
  }

  /** [[clampedRunningSum]] for STRING keys (series names, event types)
    * — same contract, same single-exchange sorted O(1)-state shape.
    * Kept as a separate typed path rather than hashing the key to a
    * long: a hash key would force a re-join to recover the name and
    * make collisions a (remote) correctness hazard. */
  def clampedRunningSumS(df: DataFrame, key: String, ord1: String, ord2: String,
                         delta: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"lo=$lo must be <= hi=$hi")
    require(lo > -(1L << 61) && hi < (1L << 61),
      s"bounds [$lo,$hi] leave no overflow headroom")
    val spark = df.sparkSession
    import spark.implicits._
    val start = math.min(hi, math.max(lo, 0L))
    val ds: Dataset[SScanRow] = df.select(
        col(key).cast("string").as("k"),
        col(ord1).cast(LongType).as("o1"),
        col(ord2).cast(LongType).as("o2"),
        col(delta).cast(LongType).as("d"))
      .as[SScanRow]
    ds.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions { it =>
        var cur: String = null
        var started = false
        var bal = start
        it.map { r =>
          if (!started || r.k != cur) { cur = r.k; started = true; bal = start }
          bal = math.min(hi, math.max(lo, bal + r.d))
          SBalRow(r.k, r.o1, r.o2, bal)
        }
      }
      .toDF(key, ord1, ord2, "bal")
  }

  /** Holt's linear-trend smoothing per key — the two-state member of
    * the fold family ([[ewma]] is the one-state case):
    * {{{
    *   l' = alpha*x + (1-alpha)*(l + b)
    *   b' = beta*(l' - l) + (1-beta)*b
    * }}}
    * seeded `l = first x, b = 0`. Emits (level, trend) after every
    * observation; `level + trend` is the one-step-ahead forecast. The
    * same bit-stability contract as [[ewma]] — both engines evaluate
    * the pinned expression trees left-to-right on identical doubles
    * (an oracle repeats the l' expression inside b'; same value, since
    * double evaluation is deterministic) — and the same reason it is a
    * sequential fold: the 2×2 affine composition exists but float
    * reassociation breaks bit-stability. Pass exact binary fractions
    * for both smoothing constants. */
  def holt(df: DataFrame, key: String, ord1: String, ord2: String,
           value: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0, 1]")
    require(beta >= 0 && beta <= 1, s"beta=$beta out of [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    val ds: Dataset[DScanRow] = df.select(
        col(key).cast(LongType).as("k"),
        col(ord1).cast(LongType).as("o1"),
        col(ord2).cast(LongType).as("o2"),
        col(value).cast("double").as("x"))
      .as[DScanRow]
    ds.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var started = false
        var l = 0.0
        var b = 0.0
        it.map { r =>
          if (!started || r.k != cur) {
            cur = r.k; started = true; l = r.x; b = 0.0
          } else {
            val l1 = alpha * r.x + a1 * (l + b)
            b = beta * (l1 - l) + b1 * b
            l = l1
          }
          HoltRow(r.k, r.o1, r.o2, l, b)
        }
      }
      .toDF(key, ord1, ord2, "level", "trend")
  }

  /** Holt–Winters additive-seasonal smoothing per key — the
    * (2+m)-state member of the fold family ([[holt]] is the m=0 case):
    * {{{
    *   l' = alpha*(x - s[t mod m]) + (1-alpha)*(l + b)
    *   b' = beta*(l' - l) + (1-beta)*b
    *   s[t mod m] := gamma*(x - l') + (1-gamma)*s[t mod m]
    * }}}
    * seeded `l = first x, b = 0, s = zeros` (the seasonal profile is
    * LEARNED by the recursion rather than pre-estimated from the first
    * cycle — a deterministic seed that needs no lookahead buffering,
    * so the fold stays a one-pass O(m)-state scan; after a few cycles
    * the slots converge to the usual additive profile). Emits
    * (level, trend, seasonal-after-update) per observation;
    * `level + trend + s[(t+1) mod m]` is the one-step-ahead forecast.
    * Same bit-stability contract as [[ewma]]/[[holt]]: both engines
    * evaluate the pinned expression trees left-to-right on identical
    * doubles — the oracle's recursive CTE carries the m seasonal slots
    * as a DOUBLE list and repeats the l' expression where SQL cannot
    * bind it mid-row (deterministically the same value). All three
    * smoothing constants must be exact binary fractions. Sequential for
    * the [[holt]] reason, plus the seasonal array makes even the
    * affine-composition escape hatch (m+2)-dimensional — there is
    * genuinely no window form. */
  def holtWinters(df: DataFrame, key: String, ord1: String, ord2: String,
                  value: String, alpha: Double, beta: Double, gamma: Double,
                  m: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0, 1]")
    require(beta >= 0 && beta <= 1, s"beta=$beta out of [0, 1]")
    require(gamma >= 0 && gamma <= 1, s"gamma=$gamma out of [0, 1]")
    require(m >= 2, s"seasonal period m=$m must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    val g1 = 1.0 - gamma
    val ds: Dataset[DScanRow] = df.select(
        col(key).cast(LongType).as("k"),
        col(ord1).cast(LongType).as("o1"),
        col(ord2).cast(LongType).as("o2"),
        col(value).cast("double").as("x"))
      .as[DScanRow]
    ds.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var started = false
        var l = 0.0
        var b = 0.0
        var t = 0L
        var s: Array[Double] = null
        it.map { r =>
          if (!started || r.k != cur) {
            cur = r.k; started = true
            l = r.x; b = 0.0; t = 0L; s = new Array[Double](m)
          } else {
            t += 1
            val sl = (t % m).toInt
            val sOld = s(sl)
            val l1 = alpha * (r.x - sOld) + a1 * (l + b)
            b = beta * (l1 - l) + b1 * b
            s(sl) = gamma * (r.x - l1) + g1 * sOld
            l = l1
          }
          // one-step-ahead forecast from the post-update state: the
          // NEXT step's seasonal slot (last touched m steps ago)
          HwRow(r.k, r.o1, r.o2, l, b, s((t % m).toInt),
                l + b + s(((t + 1) % m).toInt))
        }
      }
      .toDF(key, ord1, ord2, "level", "trend", "seasonal", "forecast")
  }

  /** Exponentially-weighted moving average per key: the linear
    * recurrence `s := alpha*x + (1-alpha)*s`, seeded with the key's
    * first value — pandas' `ewm(adjust=False)` semantics, the smoother
    * behind monitoring baselines and trading signals. Same execution
    * shape as [[clampedRunningSum]].
    *
    * A linear recurrence DOES have an associative pair-composition
    * `(a1,b1)∘(a2,b2) = (a1·a2, a2·b1+b2)`, so a ShardedPrefix-style
    * two-pass scan exists mathematically — but float composition
    * REASSOCIATES the products, which changes rounding and breaks
    * bit-stable results across partitionings (and Spark has no native
    * scan primitive to hand it to). The sequential fold is the
    * hash-stable choice: every engine that evaluates
    * `alpha*x + (1-alpha)*s` left-to-right on the same doubles produces
    * the identical bit pattern, which is what lets a recursive-CTE
    * oracle match it exactly. Callers pass `alpha` as an exactly-
    * representable binary fraction (0.125, 0.25, 0.5) so `1-alpha` is
    * also exact and the cross-engine literal agrees.
    */
  def ewma(df: DataFrame, key: String, ord1: String, ord2: String,
           value: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha
    val ds: Dataset[DScanRow] = df.select(
        col(key).cast(LongType).as("k"),
        col(ord1).cast(LongType).as("o1"),
        col(ord2).cast(LongType).as("o2"),
        col(value).cast("double").as("x"))
      .as[DScanRow]
    ds.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var started = false
        var s = 0.0
        it.map { r =>
          if (!started || r.k != cur) { cur = r.k; started = true; s = r.x }
          else s = alpha * r.x + beta * s
          DOutRow(r.k, r.o1, r.o2, s)
        }
      }
      .toDF(key, ord1, ord2, "ewma")
  }
}
