package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native extension entry point: makes every graft expression —
  * the codegen'd URL functions and the Bloom sketch pair — available in
  * ANY session (SQL and `call_function`) via standard configuration:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * (The `UrlExpressions`/`SketchExpressions` helpers self-register into
  * the active session lazily, so the extension is optional for Column-API
  * users — it exists for spark-submit / SQL-only deployments where the
  * session is built from config.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("canonicalize_url", "canonicalize_url(url) - w3lib/Scrapy-style canonical form") {
      exprs => CanonicalizeUrl(exprs.head)
    }
    inject("url_fingerprint", "url_fingerprint(url) - sha1 of GET + canonical url") {
      exprs => UrlFingerprint(exprs.head)
    }
    inject("url_host", "url_host(url) - lowercased host or ''") {
      exprs => UrlHost(exprs.head)
    }
    inject("url_path", "url_path(url) - path component, '/' default") {
      exprs => UrlPath(exprs.head)
    }
    inject("fnv1a64", "fnv1a64(s) - stable FNV-1a 64-bit hash of the UTF-8 bytes") {
      exprs => Fnv1a64(exprs.head)
    }
    inject("graft_bloom_agg", "graft_bloom_agg(col, items, numBits) - serialized Bloom filter") {
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2))
    }
    inject("graft_might_contain", "graft_might_contain(bloom, value) - Bloom membership") {
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1))
    }
    inject("fast_terms", "fast_terms(text) - distinct lowercased len>1 word runs (FTS tokenizer)") {
      exprs => FastTerms(exprs.head)
    }
    inject("fast_tokens", "fast_tokens(text) - ordered word-token multiset (dedup tokenizer)") {
      exprs => FastTokens(exprs.head)
    }
    inject("fast_shingles", "fast_shingles(text, k) - distinct k-word shingles; k a literal int") {
      exprs => FastShingles(exprs.head, litInt(exprs(1), "fast_shingles", "k"))
    }
    inject("simhash64", "simhash64(text) - fused 64-bit token SimHash (xxhash64 bit source); null when no tokens") {
      exprs => SimHash64(exprs.head)
    }
    inject("minhash_sigs", "minhash_sigs(text, k, n) - fused n-slot MinHash signature over k-shingles; k, n literal ints") {
      exprs => MinHashSigs(exprs.head,
        litInt(exprs(1), "minhash_sigs", "k"), litInt(exprs(2), "minhash_sigs", "n"))
    }
    inject("lsh_band_hashes", "lsh_band_hashes(sig, bands, r) - fused per-band LSH hashes of a BIGINT signature array; bands, r literal ints") {
      exprs => LshBandHashes(exprs.head,
        litInt(exprs(1), "lsh_band_hashes", "bands"), litInt(exprs(2), "lsh_band_hashes", "r"))
    }
    inject("winnow_fp", "winnow_fp(text, w) - fused winnowing fingerprint struct<fingerprint,fp_hash>; w a literal int") {
      exprs => WinnowFp(exprs.head, litInt(exprs(1), "winnow_fp", "w"))
    }
    inject("sorted_shingle_set", "sorted_shingle_set(text, k) - binary-sorted distinct k-word shingles; k a literal int") {
      exprs => SortedShingleSet(exprs.head, litInt(exprs(1), "sorted_shingle_set", "k"))
    }
    inject("sorted_intersect_count", "sorted_intersect_count(a, b) - |A∩B| of two binary-sorted ARRAY<STRING>s by linear merge") {
      exprs => SortedIntersectCount(exprs(0), exprs(1))
    }
  }

  /** SQL surface of a constructor-Int parameter: the argument must fold
    * to a non-null INT literal at plan time (a column-valued k would
    * need a per-row windowing expression — not this operator's contract).
    */
  private def litInt(e: Expression, fn: String, arg: String): Int = {
    // the builder can see unresolved children, whose foldable/dataType
    // throw — any such argument is equally not a literal INT
    val v = try {
      if (e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType) e.eval()
      else null
    } catch { case _: Exception => null }
    if (v == null) throw new IllegalArgumentException(
      s"$fn($arg) requires a literal INT, got ${e.simpleString(100)}")
    v.asInstanceOf[Int]
  }
}
