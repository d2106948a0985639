package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Injectable hash family for the sketching operators — MinHash
  * signatures, LSH band hashes, winnowing fingerprints.
  *
  * The sketches only ever need ORDERING and EQUALITY on hash values
  * (`min` per permutation slot, equi-join on band hashes), never bit
  * arithmetic, so a family can return any orderable column type.
  *
  *   - [[HashFamily.XxHash64]] — production default: Spark-native
  *     `xxhash64`, codegen'd, 8-byte values, the cheapest thing the
  *     engine can evaluate per shingle. But the algorithm is
  *     Spark-specific: no external engine recomputes it, so every
  *     signature-bearing query was stuck as a rows-only correctness
  *     check.
  *   - [[HashFamily.Md5Hex]] — the cross-engine family: seeded md5,
  *     kept as the 32-char lowercase-hex string. md5 is universal
  *     (DuckDB, Trino, Postgres…), and fixed-width hex strings compare
  *     byte-identically everywhere, so a DuckDB oracle can twin the
  *     ENTIRE MinHash → banding → candidate-join → exact-verify
  *     pipeline value-for-value (CORRECTNESS rows dd02 / dd03 / dd10 /
  *     ta04). 4× wider values than xxhash64 — a verification
  *     parameterization, not the 10^10-doc default.
  *
  * Both families feed the SAME pipeline code — the operators are
  * family-generic, so the hard-oracle runs exercise exactly the plans
  * production runs, just with a different leaf expression.
  */
sealed trait HashFamily {
  /** Seeded hash of a string column; orderable + equality-comparable.
    * Distinct seeds must give (approximately) independent functions.
    */
  def hash(value: Column, seed: Column): Column
  final def hash(value: Column, seed: Int): Column = hash(value, lit(seed))
}

object HashFamily {

  /** Spark-native 64-bit xxhash, seed mixed in as an extra hashed word. */
  case object XxHash64 extends HashFamily {
    override def hash(value: Column, seed: Column): Column =
      xxhash64(value, seed)
  }

  /** Seeded md5 as lowercase hex — the DuckDB-twinnable family:
    * `md5(seed || ':' || value)` is the same bytes in any engine.
    */
  case object Md5Hex extends HashFamily {
    override def hash(value: Column, seed: Column): Column =
      md5(concat(seed.cast("string"), lit(":"), value))
  }
}
