package graft.url

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class UrlsSpec extends AnyFunSuite {

  /** deterministic property driver (scalatestplus bridge not vendored). */
  private def forAllGen[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("canonicalize: lowercase host, strip fragment, keep path") {
    assert(Urls.canonicalize("http://ABCDEFGHIJ234567.ONION/Page#frag") ==
      "http://abcdefghij234567.onion/Page")
  }

  test("canonicalize: empty path becomes /") {
    assert(Urls.canonicalize("http://abcdefghij234567.onion") ==
      "http://abcdefghij234567.onion/")
  }

  test("canonicalize: query params sorted by (key, value)") {
    assert(Urls.canonicalize("http://x234567abcdefghi.onion/p?b=2&a=1&a=0") ==
      "http://x234567abcdefghi.onion/p?a=0&a=1&b=2")
  }

  test("canonicalize: default port stripped, explicit kept") {
    assert(Urls.canonicalize("http://h234567abcdefghi.onion:80/") ==
      "http://h234567abcdefghi.onion/")
    assert(Urls.canonicalize("http://h234567abcdefghi.onion:8080/") ==
      "http://h234567abcdefghi.onion:8080/")
  }

  test("canonicalize: %-escapes normalized (unreserved decoded, hex uppercased)") {
    assert(Urls.canonicalize("http://h.onion/a%2fb%41") == "http://h.onion/a%2FbA")
  }

  test("canonicalize: dot segments removed") {
    assert(Urls.canonicalize("http://h.onion/a/b/../c/./d") == "http://h.onion/a/c/d")
  }

  val urlGen: Gen[String] = for {
    host <- Gen.stringOfN(16, Gen.oneOf("abcdefghijklmnopqrstuvwxyz234567".toSeq))
    path <- Gen.oneOf("", "/", "/a", "/a/b", "/a%2Fb", "/x y")
    q <- Gen.oneOf("", "?b=2&a=1", "?z", "?a=1&a=0")
    f <- Gen.oneOf("", "#x", "#")
    scheme <- Gen.oneOf("http", "HTTP", "https")
  } yield s"$scheme://$host.onion$path$q$f"

  test("property: canonicalize is idempotent") {
    forAllGen(urlGen) { u =>
      val c = Urls.canonicalize(u)
      assert(Urls.canonicalize(c) == c, s"not idempotent for $u")
    }
  }

  test("property: fragment never survives") {
    forAllGen(urlGen) { u => assert(!Urls.canonicalize(u).contains("#")) }
  }

  test("fingerprint: stable sha1 of GET + canonical") {
    val u = "http://abcdefghij234567.onion/#top"
    assert(Urls.fingerprint(u) == Urls.fingerprint("http://ABCDEFGHIJ234567.onion/"))
    assert(Urls.fingerprint(u).matches("[0-9a-f]{40}"))
  }

  test("resolve: relative, absolute, rejects non-http and fragments") {
    val base = "http://abcdefghij234567.onion/dir/page"
    assert(Urls.resolve(base, "/p1") == Some("http://abcdefghij234567.onion/p1"))
    assert(Urls.resolve(base, "p1") == Some("http://abcdefghij234567.onion/dir/p1"))
    assert(Urls.resolve(base, "../up") == Some("http://abcdefghij234567.onion/up"))
    assert(Urls.resolve(base, "http://other234567abcdefg.onion/x#f") ==
      Some("http://other234567abcdefg.onion/x"))
    assert(Urls.resolve(base, "#frag").isEmpty)
    assert(Urls.resolve(base, "mailto:a@b.c").isEmpty)
    assert(Urls.resolve(base, "javascript:void(0)").isEmpty)
  }

  test("resolve fast path equals the java.net.URI spec on adversarial (base, href) pairs") {
    // the pure-URI formulation IS the spec; the guarded string fast path
    // must be indistinguishable through resolve()'s public result
    def specResolve(base: String, href: String): Option[String] = {
      val h = href.trim
      if (h.isEmpty || h.startsWith("#") || h.startsWith("javascript:") ||
          h.startsWith("mailto:") || h.startsWith("data:")) None
      else try {
        val escaped = h.replace(" ", "%20").replace("\"", "%22").replace("<", "%3C")
          .replace(">", "%3E").replace("|", "%7C").replace("`", "%60")
          .replace("\\", "%5C").replace("^", "%5E").replace("{", "%7B")
          .replace("}", "%7D")
        val resolved =
          if (h.contains("://")) h
          else new java.net.URI(base).resolve(escaped).toString
        if (Urls.hostOf(resolved).nonEmpty) Some(Urls.canonicalize(resolved))
        else None
      } catch { case _: Exception => None }
    }
    val rnd = new scala.util.Random(4242)
    val hosts = Seq("abcdefghij234567.onion", "x.abcdefghij234567.onion")
    val basePaths = Seq("", "/", "/a", "/a/", "/a/b", "/a/b/", "/a/../b", "/a%2Fb", "/a?q=1", "/a/b?x=2&a=1")
    val hrefFrags = Seq("p1", "p1?b=2&a=1", "/p1", "/p1?a=1#f", "a/b/c", "../up", "./same", "..", ".",
      "?only=query", "//proto.relative.onion/x", "p with space", "we{ird}", "q'uote", "sub;semi=1",
      "%2e%2e/enc", "a:b", "a/b:c", "#f", "", "   ", "p1#frag", "~user/x", "a+b,c", "(paren)", "!bang$")
    for (i <- 0 until 5000) {
      val base = s"http://${hosts(rnd.nextInt(hosts.length))}${basePaths(rnd.nextInt(basePaths.length))}"
      val href = hrefFrags(rnd.nextInt(hrefFrags.length))
      val got = Urls.resolve(base, href)
      val want = specResolve(base, href)
      assert(got == want, s"case $i: base=<$base> href=<$href> got=$got want=$want")
    }
  }

  test("isOnionHost: v2 + v3 + subdomains, rejects clearnet") {
    assert(Urls.isOnionHost("abcdefghij234567.onion"))
    assert(Urls.isOnionHost("a" * 56 + ".onion"))
    assert(Urls.isOnionHost("www.abcdefghij234567.onion"))
    assert(!Urls.isOnionHost("example.com"))
    assert(!Urls.isOnionHost("short.onion"))
    assert(!Urls.isOnionHost("abcdefghij23456789.onion")) // 18 chars: neither 16 nor 56
  }
}
