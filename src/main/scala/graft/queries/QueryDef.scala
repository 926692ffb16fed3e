package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-facing declared query.
  *
  * @param name     stable key (drives `SparkEntry.queries` / `oracleSql`)
  * @param oracle   equivalent ANSI SQL runnable by DuckDB over the same
  *                 parquet tables; None for ops DuckDB can't express
  *                 (those get the driver's weaker rows-only check).
  * @param noOracleReason REQUIRED exactly when `oracle` is None (Registry
  *                 enforces the XOR): why no hash-comparable oracle can
  *                 exist and where the semantics ARE pinned instead.
  *                 Verify dumps these as `oracle_exclusions.json` so the
  *                 driver's gate can tell "explicitly excluded, verified
  *                 elsewhere" from "unverified" (ADVICE r9 #2).
  * @param releases SessionCache key prefixes whose LAST consumer (in the
  *                 harnesses' sorted-by-name sweep order) is this query:
  *                 Verify/Bench release them once this query's action
  *                 completes. A release point that turns out early (a
  *                 spec or ad-hoc caller arriving later) just rebuilds
  *                 the entry — storage knob, never correctness.
  * @param build    the Spark-side plan builder. MUST be deterministic
  *                 (stable ORDER BY, no uuid()/rand()) and column names
  *                 MUST match the oracle's exactly — the driver sorts
  *                 columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    releases: Seq[String] = Nil,
    noOracleReason: Option[String] = None)(
    val build: (SparkSession, String) => DataFrame)
