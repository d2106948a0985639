package graft.dedup

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Engine-owned Bloom filter (SURVEY.md §3.10 U4) — standard Bloom math
  * (Kirsch–Mitzenmacher double hashing over xxhash64), tuned for the two
  * places the crawl loop is filter-bound at scale:
  *
  *   - MERGE is a bulk word-wise OR over the raw `long[]` — no streaming
  *     deserialization. The stock sketch filter re-reads every word
  *     through an unbuffered `DataInputStream.readLong` on merge, which
  *     profiled at 7.5s of single-task CPU per round merging eight 9 MB
  *     partials; the same merge here is a memcpy-speed loop.
  *   - Partial filters reduce EXECUTOR-SIDE via `treeReduce`, so the
  *     driver receives exactly one filter no matter how many partitions
  *     build partials (the per-task-partial-to-driver failure mode is
  *     structurally impossible).
  *
  * Correctness posture is unchanged from the sketch version: the filter
  * is ONLY ever a prefilter with an exact join as authority, so any
  * hashing/sizing choice affects FPP, never results.
  *
  * Serialized form (sidecar + shuffle): [numBits long][numHashes int]
  * [words...] via ByteBuffer bulk ops.
  */
final class FastBloom(val numBits: Long, val numHashes: Int, val words: Array[Long])
    extends Serializable {

  /** h_i = h1 + i*h2 (Kirsch–Mitzenmacher); bits set modulo numBits. */
  private def setBit(idx: Long): Unit = {
    val i = (idx >>> 6).toInt
    words(i) |= 1L << (idx & 63)
  }
  private def getBit(idx: Long): Boolean = {
    val i = (idx >>> 6).toInt
    (words(i) & (1L << (idx & 63))) != 0L
  }

  def putHashes(h1: Long, h2: Long): Unit = {
    var i = 0
    var h = h1
    while (i < numHashes) {
      setBit(java.lang.Math.floorMod(h, numBits))
      h += h2
      i += 1
    }
  }

  def mightContainHashes(h1: Long, h2: Long): Boolean = {
    var i = 0
    var h = h1
    while (i < numHashes) {
      if (!getBit(java.lang.Math.floorMod(h, numBits))) return false
      h += h2
      i += 1
    }
    true
  }

  def put(bytes: Array[Byte]): Unit = {
    val h1 = FastBloom.hash(bytes, FastBloom.Seed1)
    putHashes(h1, FastBloom.hash(bytes, h1))
  }

  def putString(s: String): Unit = put(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def mightContain(bytes: Array[Byte]): Boolean = {
    val h1 = FastBloom.hash(bytes, FastBloom.Seed1)
    mightContainHashes(h1, FastBloom.hash(bytes, h1))
  }

  def mightContainString(s: String): Boolean =
    s != null && mightContain(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Probe a UTF8String's bytes IN PLACE (xxhash64 over base+offset — no
    * per-row byte-array copy). Bit-identical to [[mightContainString]] on
    * the same text: a String's UTF-8 encoding is exactly the UTF8String's
    * bytes. This is the hot-path probe the native
    * [[graft.functions.FastBloomMightContain]] expression calls per row.
    */
  def mightContainUTF8(u: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val h1 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, FastBloom.Seed1)
    val h2 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, h1)
    mightContainHashes(h1, h2)
  }

  /** Bulk word-wise OR; requires identical (numBits, numHashes). */
  def orInPlace(other: FastBloom): FastBloom = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"incompatible FastBloom merge: ($numBits,$numHashes) vs (${other.numBits},${other.numHashes})")
    var i = 0
    val w = words; val o = other.words
    while (i < w.length) { w(i) |= o(i); i += 1 }
    this
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + words.length * 8)
    bb.putLong(numBits).putInt(numHashes)
    bb.asLongBuffer().put(words)
    bb.array()
  }
}

object FastBloom {
  private[dedup] val Seed1: Long = 0x9E3779B97F4A7C15L // golden-ratio odd

  /** xxhash64 over raw bytes — Spark's codegen'd implementation, the same
    * family the engine already standardizes on (SURVEY §3.7 R14).
    */
  def hash(bytes: Array[Byte], seed: Long): Long =
    XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, seed)

  /** Same sizing formula as the sketch filter (optimal bits for n at p),
    * words rounded up; k = round(bits/n · ln 2), floor 1.
    */
  def create(expectedItems: Long, fpp: Double): FastBloom = {
    val n = math.max(1L, expectedItems)
    val bits0 = math.max(64L,
      (-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // Above ~1.37e11 bits the word count overflows Int and new Array[Long]
    // would throw NegativeArraySizeException — fail with the fix named
    // instead (this is exactly the multi-GB regime sharding exists for).
    require(bits0 / 64 + 1 <= Int.MaxValue,
      s"FastBloom too large: $bits0 bits (${bits0 / 8 / (1L << 30)} GiB) — " +
        "raise seenShardBits or fpp")
    val numWords = ((bits0 + 63) / 64).toInt
    val bits = numWords.toLong * 64
    val k = math.max(1, math.round(bits.toDouble / n * math.log(2)).toInt)
    new FastBloom(bits, k, new Array[Long](numWords))
  }

  def fromBytes(b: Array[Byte]): FastBloom = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val bits = bb.getLong
    val k = bb.getInt
    val words = new Array[Long](((bits + 63) / 64).toInt)
    bb.asLongBuffer().get(words)
    new FastBloom(bits, k, words)
  }
}
