package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

/** FastBloom unit properties: the no-false-negative guarantee the whole
  * seen-set design rests on, merge ≡ union, serialization round-trip,
  * and sane FPP at the sizing formula.
  */
class FastBloomSpec extends AnyFunSuite {

  private def keys(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => s"fp-${rnd.nextLong()}")
  }

  test("no false negatives, ever") {
    val bf = FastBloom.create(10000, 0.03)
    val ks = keys(1, 10000)
    ks.foreach(bf.putString)
    ks.foreach(k => assert(bf.mightContainString(k), k))
  }

  test("FPP near the configured target at the sized load") {
    val bf = FastBloom.create(10000, 0.01)
    keys(2, 10000).foreach(bf.putString)
    val probes = keys(3, 20000)
    val fp = probes.count(bf.mightContainString)
    // generous bound: 3x the target on 20k probes
    assert(fp <= 20000 * 0.03, s"fpp ${fp / 20000.0}")
  }

  test("orInPlace ≡ union of inserted sets; incompatible sizing refused") {
    val a = FastBloom.create(5000, 0.03)
    val b = FastBloom.create(5000, 0.03)
    val ka = keys(4, 3000)
    val kb = keys(5, 3000)
    ka.foreach(a.putString)
    kb.foreach(b.putString)
    a.orInPlace(b)
    (ka ++ kb).foreach(k => assert(a.mightContainString(k)))
    val c = FastBloom.create(50000, 0.03)
    intercept[IllegalArgumentException](a.orInPlace(c))
  }

  test("serialization round-trip preserves bits, sizing and membership") {
    val bf = FastBloom.create(2000, 0.01)
    val ks = keys(6, 2000)
    ks.foreach(bf.putString)
    val back = FastBloom.fromBytes(bf.toBytes)
    assert(back.numBits == bf.numBits && back.numHashes == bf.numHashes)
    assert(back.words.toSeq == bf.words.toSeq)
    ks.foreach(k => assert(back.mightContainString(k)))
  }

  test("empty filter matches nothing") {
    val bf = FastBloom.create(1000, 0.01)
    assert(keys(7, 1000).forall(k => !bf.mightContainString(k)))
    assert(!bf.mightContainString(null))
  }

  test("put via raw bytes ≡ putString for UTF-8 content") {
    val bf = FastBloom.create(100, 0.01)
    val s = "héllo-⚡-fp"
    bf.put(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(bf.mightContainString(s))
  }

  test("mightContainUTF8 ≡ mightContainString (in-place hashing, same bits)") {
    val bf = FastBloom.create(5000, 0.03)
    val ks = keys(7, 2000) :+ "héllo-⚡-fp" :+ ""
    ks.take(1000).foreach(bf.putString)
    ks.foreach { k =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(k)
      assert(bf.mightContainUTF8(u) == bf.mightContainString(k), k)
    }
  }

  test("probe expressions run under CODEGEN_ONLY (no silent interpreted fallback) and match the driver-side filter") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val bf = FastBloom.create(5000, 0.03)
    val ks = keys(8, 500)
    ks.take(250).foreach(bf.putString)
    val df = (ks :+ null).toDF("fp")
    val bc = spark.sparkContext.broadcast(bf)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = df.filter(graft.functions.BloomProbe.mightContain(bc, org.apache.spark.sql.functions.col("fp")))
        .as[String].collect().toSet
      val want = ks.filter(bf.mightContainString).toSet
      assert(got == want)
      // sharded variant: 4 identical shards + a constant shard column
      val bcs = Array.fill(4)(spark.sparkContext.broadcast(bf))
      val got2 = df
        .withColumn("s", org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.col("fp")),
          org.apache.spark.sql.functions.lit(4)))
        .filter(graft.functions.BloomProbe.mightContainSharded(bcs,
          org.apache.spark.sql.functions.col("fp"), org.apache.spark.sql.functions.col("s")))
        .select("fp").as[String].collect().toSet
      assert(got2 == want)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
