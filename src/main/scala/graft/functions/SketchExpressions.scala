package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit}

/** Column-API access to Spark's NATIVE Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind Catalyst's injected runtime filters). They are not exposed in
  * the public FunctionRegistry, so we register them ourselves, exactly
  * like the URL expressions.
  *
  * Why: a Bloom built by `bloom_filter_agg` inside an EXISTING aggregation
  * or observed metric costs ZERO extra Spark jobs, while
  * `df.stat.bloomFilter` always launches its own RDD job. The serialized
  * bytes deserialize into `org.apache.spark.util.sketch.BloomFilter`
  * (same on-disk format), so incremental `mergeInPlace` and
  * `mightContainString` keep working on the driver/executors.
  */
object SketchExpressions {

  /** mirror of sketch BloomFilter.optimalNumOfBits(n, p) — keep every
    * filter in the engine sized by the SAME formula so mergeInPlace never
    * sees incompatible (bits, hashes) pairs.
    */
  def optimalNumOfBits(expectedItems: Long, fpp: Double): Long = math.max(
    64L,
    (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

  /** The session's runtime-Bloom limits. `BloomFilterAggregate` SILENTLY
    * clamps `estimatedNumItems`/`numBits` to these confs (verified against
    * the shipped spark-catalyst 4.1.2 bytecode: `Math.min` in the lazy
    * vals, and `stat.bloomFilter` routes through the same aggregate), so
    * a driver-side `BloomFilter.create` sized above them can NEVER merge
    * with an aggregate-built delta — `mergeInPlace` hard-fails on the bit
    * width. Every engine filter therefore sizes through [[clampedSizing]],
    * and callers that genuinely need bigger filters raise these confs
    * first (CrawlLoop does, from CrawlConfig).
    */
  def bloomConfMax: (Long, Long) = {
    val conf = SparkSession.active.conf
    def get(k: String, dflt: Long): Long =
      try conf.get(k).toLong catch { case _: Exception => dflt }
    (get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L),
      get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L))
  }

  /** (items, numBits) EXACTLY as the native aggregate will size them under
    * the current session confs — the one sizing formula the whole engine
    * shares. A clamp only raises FPP, which every Bloom use in the engine
    * tolerates by design (prefilter + exact authority).
    */
  def clampedSizing(expectedItems: Long, fpp: Double): (Long, Long) = {
    val (maxItems, maxBits) = bloomConfMax
    val items = math.min(math.max(1L, expectedItems), maxItems)
    (items, math.min(optimalNumOfBits(items, fpp), maxBits))
  }

  @volatile private var registeredIn: SparkSession = _

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    registeredIn = spark
  }

  private def ensure(): Unit = {
    val s = SparkSession.active
    if (registeredIn ne s) register(s)
  }

  /** Bloom aggregate over a string/long column, sized like
    * `BloomFilter.create(expectedItems, fpp)` after [[clampedSizing]] —
    * the literals are pre-clamped so the aggregate's internal `Math.min`
    * no-ops and driver-side `BloomFilter.create(items, bits)` twins stay
    * bit-compatible for `mergeInPlace`. Returns the serialized filter
    * (binary) — `readSketch` turns it back into a sketch object.
    */
  def bloom_agg(c: Column, expectedItems: Long, fpp: Double): Column = {
    ensure()
    val (items, bits) = clampedSizing(expectedItems, fpp)
    call_function("graft_bloom_agg", c, lit(items), lit(bits))
  }

  /** Map-side Bloom membership probe against a (foldable) serialized
    * filter — stays inside codegen, unlike a broadcast+UDF probe.
    * NOTE: the native probe accepts BIGINT values only (build the filter
    * over `xxhash64(col)` to use it); string-built filters are probed
    * with `BloomFilter.mightContainString` via [[readSketch]].
    */
  def might_contain(bloomBytes: Column, value: Column): Column = {
    ensure()
    call_function("graft_might_contain", bloomBytes, value)
  }

  def readSketch(bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
}
