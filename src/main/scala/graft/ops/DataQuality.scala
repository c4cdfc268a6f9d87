package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/Great-
  * Expectations surface, re-expressed as pure Catalyst aggregates): the
  * caller declares WHAT must hold — row predicates, key uniqueness,
  * referential integrity — and [[check]] compiles the declarations into
  * the minimal set of scans.
  *
  * The reference validates its frames implicitly (coercion sweeps +
  * null fills, `main.py`'s try/except around every fetch); a 100 TB
  * ingest needs the explicit, auditable form: a constraint table the
  * pipeline can gate on.
  *
  * Scale contract:
  *  - ALL [[RowCheck]]s over a table fuse into ONE aggregate pass —
  *    one scan, one map-side-partial count per predicate, never one
  *    job per constraint (the naive loop's cost at 100 TB).
  *  - [[UniqueCheck]] is one hash aggregate on the key (the check IS
  *    a groupBy; no window, no self-join).
  *  - [[FkCheck]] is one equi-join against the DISTINCT dimension keys
  *    — Catalyst/AQE broadcasts the dim side when it is small (the
  *    usual case for dimensions), and the join stays a shuffle join
  *    when it is not; either way no per-row subquery.
  *
  * Null semantics match SQL's `count(*) FILTER (WHERE pred)`: a
  * predicate that evaluates to NULL on a row does not count as a
  * violation — declare explicit `isNull` checks for completeness
  * constraints.
  */
object DataQuality {

  /** A per-row predicate that must NOT hold: `violation` true (not
    * null, not false) on a row counts it as violating. */
  final case class RowCheck(name: String, violation: Column)

  /** The column tuple must be unique; violations = total rows living
    * in key groups of size > 1 (Deequ's uniqueness counting). */
  final case class UniqueCheck(name: String, cols: Seq[String])

  /** Every (non-null) `keyCol` must exist in `dim`'s `dimKey` column;
    * a NULL foreign key counts as a violation (declare a separate
    * RowCheck if nulls are permitted and filter them first). */
  final case class FkCheck(name: String, keyCol: String,
                           dim: DataFrame, dimKey: String)

  /** Evaluates the declared constraints over `df`, returning one row
    * per constraint: (check_name, n_rows, n_violations, pass).
    * `n_rows` is the number of rows the constraint inspected. */
  def check(df: DataFrame,
            rowChecks: Seq[RowCheck],
            uniques: Seq[UniqueCheck] = Nil,
            fks: Seq[FkCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniques.nonEmpty || fks.nonEmpty,
      "DataQuality.check: at least one constraint required")
    val parts = Seq.newBuilder[DataFrame]

    if (rowChecks.nonEmpty) {
      // the fused single pass: count(*) + one conditional count per check
      val aggs = count(lit(1)).cast("long").as("_n") +:
        rowChecks.zipWithIndex.map { case (c, i) =>
          coalesce(sum(when(c.violation, 1L)), lit(0L)).cast("long").as(s"_v$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val entries = rowChecks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"), col("_n").as("n_rows"),
               col(s"_v$i").as("n_violations"))
      }
      parts += one.select(explode(array(entries: _*)).as("e"))
        .select(col("e.check_name").as("check_name"),
                col("e.n_rows").as("n_rows"),
                col("e.n_violations").as("n_violations"))
    }

    uniques.foreach { u =>
      parts += df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("_c"))
        .agg(coalesce(sum(col("_c")), lit(0L)).cast("long").as("n_rows"),
             coalesce(sum(when(col("_c") > 1, col("_c"))), lit(0L))
               .cast("long").as("n_violations"))
        .select(lit(u.name).as("check_name"), col("n_rows"), col("n_violations"))
    }

    fks.foreach { f =>
      val dimKeys = f.dim.select(col(f.dimKey).as("_dk")).distinct()
      parts += df.select(col(f.keyCol).as("_fk"))
        .join(dimKeys, col("_fk") === col("_dk"), "left")
        .agg(count(lit(1)).cast("long").as("n_rows"),
             coalesce(sum(when(col("_dk").isNull, 1L)), lit(0L))
               .cast("long").as("n_violations"))
        .select(lit(f.name).as("check_name"), col("n_rows"), col("n_violations"))
    }

    parts.result().reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
