package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Injectable hash family for the sketching operators — MinHash
  * signatures, LSH band hashes, winnowing fingerprints.
  *
  * The sketches only ever need ORDERING and EQUALITY on hash values
  * (`min` per permutation slot, equi-join on band hashes), never bit
  * arithmetic, so the family is a leaf-expression swap under the SAME
  * pipeline code — the hard-oracle runs exercise exactly the plans
  * production runs.
  *
  *   - [[HashFamily.XxHash64]] — production default: Spark-native
  *     `xxhash64`, codegen'd, one call per (value, seed). The algorithm
  *     is Spark-specific: no external engine recomputes it, so every
  *     signature-bearing query was stuck as a rows-only check.
  *   - [[HashFamily.Md5]] — the cross-engine family: ONE md5 per value,
  *     split into two 48-bit halves h1/h2 (hex chars 1-12 and 13-24),
  *     then the classic universal-hash construction. md5 is universal
  *     and the arithmetic is exact 64-bit integer math everywhere
  *     (h1 + 63·h2 < 2^55 — no overflow even under ANSI), so a DuckDB
  *     oracle recomputes the ENTIRE MinHash → banding → candidate-join →
  *     verify pipeline value-for-value (CORRECTNESS dd02/dd03/dd10/dd11/
  *     ta04). Cost is ONE md5 + integer ops per value regardless of the
  *     seed count — the naive 64-seeded-md5s-per-shingle variant benched
  *     15× slower than xxhash64 on the dd03 headline.
  *
  * TWO seeded hashes, because sketches consume hashes two ways:
  *
  *   - [[HashFamily.hashPrepared]] — EQUALITY-oriented (band-bucket
  *     keys, fingerprint digests): only collision probability matters,
  *     so the full-width `h1 + seed·h2` (< 2^55) is right.
  *   - [[HashFamily.rankHashPrepared]] — ORDERING-oriented (MinHash
  *     permutation slots, winnowing window minima): the ORDER induced
  *     per seed must be well-mixed and ~independent across seeds.
  *     Un-reduced `h1 + j·h2` fails this badly: for j ≥ 2 the j·h2 term
  *     dominates, so argmin ≈ argmin(h2) for every high seed — the 64
  *     "permutations" collapse to ~3 distinct ones, and LSH candidate
  *     pairs explode (measured 17,689 vs 410 on the sf0.1 corpus).
  *     The fix is the textbook `(h1 + j·h2) mod p` universal family
  *     (p = 2^31−1, Mersenne prime): the wrap re-mixes the order per
  *     seed, and `%` on positive BIGINTs is exact in every engine.
  *
  * Seeds must stay < 64 so the no-overflow bound holds; the operators
  * use ≤ 64 permutations / ≤ 16 bands / seeds {0, 1}.
  */
sealed trait HashFamily {

  /** Per-value shared state the seeded hashes derive from (lets one
    * projection pay the digest once for all seeds of a value).
    */
  def prepare(value: Column): Column

  /** Equality-oriented seeded hash from [[prepare]]'s output; LongType.
    * `seed` must be in [0, 64).
    */
  def hashPrepared(prepared: Column, seed: Column): Column

  /** Ordering-oriented seeded hash (see class doc); defaults to the
    * equality hash for families whose order is already well-mixed.
    */
  def rankHashPrepared(prepared: Column, seed: Column): Column =
    hashPrepared(prepared, seed)

  /** Per-value state for [[bitAt]] (64 unbiased hash bits — SimHash's
    * consumption mode: each bit is an independent ±1 vote).
    */
  def bitSource(value: Column): Column

  /** Bit `j` (0/1 LongType, j in [0, 64)) of the value's hash. */
  def bitAt(src: Column, j: Int): Column

  final def hash(value: Column, seed: Column): Column =
    hashPrepared(prepare(value), seed)
  final def hash(value: Column, seed: Int): Column = hash(value, lit(seed))
  final def rankHash(value: Column, seed: Int): Column =
    rankHashPrepared(prepare(value), lit(seed))
}

object HashFamily {

  /** Spark-native 64-bit xxhash, seed mixed in as an extra hashed word;
    * every seed is a full independent avalanche, so rank = equality.
    *
    * prepare() hashes the VALUE once (string bytes walked a single
    * time); each seed then avalanches the prepared 64-bit word — one
    * 8-byte xxhash step per seed instead of re-reading the string per
    * seed. Measured on dd03's signature stage at sf0.1: 64 seeded mins
    * over ~5M shingle rows dropped ~2× (BENCH/BASELINE.md round 6).
    * Still the textbook hash-once-derive-many universal family; minhash
    * VALUES differ from the identity-prepare variant (fine — the
    * approximation contract is distributional, and the exact twins ride
    * the Md5 family), recall is floored by PipelineSpec either way.
    */
  case object XxHash64 extends HashFamily {
    override def prepare(value: Column): Column = xxhash64(value)
    override def hashPrepared(prepared: Column, seed: Column): Column =
      xxhash64(prepared, seed)
    override def bitSource(value: Column): Column = xxhash64(value)
    override def bitAt(src: Column, j: Int): Column =
      shiftright(src, j).bitwiseAND(lit(1L))
  }

  /** One-md5 double hashing (see class doc): prepare = (h1, h2) struct,
    * equality hash = h1 + seed·h2, rank hash = (h1 + seed·h2) mod
    * (2^31−1). DuckDB-recomputable exactly.
    *
    * This is an ORACLE-SCALE parameterization, not a production
    * substitute: the rank hash maps into only 2^31−1 values (vs
    * xxhash64's full 64-bit range), so per-seed rank collisions among
    * distinct shingles birthday at ~65k distinct shingles per
    * (doc, seed) and would slightly bias MinHash minima at full corpus
    * scale. Production paths keep the [[XxHash64]] default.
    *
    * [[MaxSeed]] guards the no-overflow invariant `h1 + seed·h2 < 2^55`
    * (class doc): literal seeds are checked here at plan-build time;
    * non-literal seeds (lshBands' lambda-bound band index) are bounded
    * by the `require`s at the [[graft.pipeline.Dedup]] entry points.
    */
  case object Md5 extends HashFamily {
    val RankModulus = 2147483647L // 2^31 - 1, prime
    val MaxSeed = 63L

    private def boundLiteralSeed(seed: Column): Unit =
      org.apache.spark.sql.graft.ColumnShim.literalValue(seed) match {
      case Some(v: Number) =>
        require(v.longValue >= 0 && v.longValue <= MaxSeed,
          s"Md5 family seed ${v.longValue} outside [0, $MaxSeed] — " +
            "h1 + seed*h2 would overflow the documented 2^55 bound")
      case _ => // non-literal (lambda variable): bounded at the entry point
    }

    override def prepare(value: Column): Column = {
      val d = md5(value)
      struct(
        conv(substring(d, 1, 12), 16, 10).cast("long").as("h1"),
        conv(substring(d, 13, 12), 16, 10).cast("long").as("h2"))
    }
    override def hashPrepared(prepared: Column, seed: Column): Column = {
      boundLiteralSeed(seed)
      prepared.getField("h1") + seed.cast("long") * prepared.getField("h2")
    }
    override def rankHashPrepared(prepared: Column, seed: Column): Column =
      pmod(hashPrepared(prepared, seed), lit(RankModulus))
    // 64 bits = h1's 48 + h2's low 16; bit ops only, so no ANSI overflow
    override def bitSource(value: Column): Column = prepare(value)
    override def bitAt(src: Column, j: Int): Column =
      if (j < 48) shiftright(src.getField("h1"), j).bitwiseAND(lit(1L))
      else shiftright(src.getField("h2"), j - 48).bitwiseAND(lit(1L))
  }
}
