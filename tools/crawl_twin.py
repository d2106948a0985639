#!/usr/bin/env python3
"""Independent cross-implementation oracle for the crawl engine.

Pure-Python replay of the determinism contract (SURVEY.md §6): seed list
-> canonicalize -> sha1 fingerprint -> priority tiers -> total order
(priority DESC, enqueue_seq ASC, url ASC) -> politeness budget -> corpus
join -> span-order link extraction -> batch dedup -> seen set -> domain
lifecycle merge.  It shares ZERO code with the Scala engine: every pure
function (splitmix64, fnv1a64, w3lib-style canonicalization, the scrapy
request fingerprint, the synthetic-corpus generators) is re-implemented
from the written contract, so a byte-for-byte match of crawl_log /
seen / domains is genuine cross-implementation evidence, not a frozen
self-golden.

Usage:
  # diff against the frozen goldens (crawl_log + seen only):
  python3 tools/crawl_twin.py --golden-dir src/test/resources/golden
  # diff against a live engine dump (crawl01_log.tsv, crawl02_domains.tsv,
  # crawl03_seen.tsv written by CrawlTwinSpec):
  python3 tools/crawl_twin.py --engine-dir /tmp/dump
  # write the twin's own tables:
  python3 tools/crawl_twin.py --out /tmp/twin

Exit code 0 = every requested diff matched exactly.
"""

import argparse
import hashlib
import math
import re
import sys
from urllib.parse import urljoin

MASK64 = (1 << 64) - 1
MASK63 = (1 << 63) - 1


# ---------------------------------------------------------------------------
# Hashing (contract: graft.url.Hashing — FNV-1a 64 + splitmix64)
# ---------------------------------------------------------------------------

def fnv1a64(s: str) -> int:
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001b3) & MASK64
    return h


def mix(z0: int) -> int:
    z = (z0 + 0x9e3779b97f4a7c15) & MASK64
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & MASK64
    return z ^ (z >> 31)


def non_neg(h: int) -> int:
    return h & MASK63


# ---------------------------------------------------------------------------
# URL canonicalization + fingerprint (contract: SURVEY §6.1 R1/R2 —
# w3lib.canonicalize_url semantics + scrapy request_fingerprint)
# ---------------------------------------------------------------------------

DEFAULT_PORTS = {"http": 80, "https": 443}
ONION_HOST_RX = re.compile(r"^([a-z0-9-]+\.)*([a-z2-7]{16}|[a-z2-7]{56})\.onion$")
UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
HEX = set("0123456789abcdefABCDEF")


def is_onion_host(host):
    return host is not None and ONION_HOST_RX.match(host.lower()) is not None


def url_split(url):
    """(scheme, host, port, path, query, fragment) or None."""
    if url is None:
        return None
    t = url.strip()
    se = t.find("://")
    if se <= 0:
        return None
    scheme = t[:se].lower()
    if scheme not in ("http", "https"):
        return None
    rest = t[se + 3:]
    i = rest.find("#")
    authority_and_path, fragment = (rest, "") if i == -1 else (rest[:i], rest[i + 1:])
    i = authority_and_path.find("?")
    authority_path, query = ((authority_and_path, "") if i == -1
                             else (authority_and_path[:i], authority_and_path[i + 1:]))
    i = authority_path.find("/")
    authority, path = ((authority_path, "") if i == -1
                       else (authority_path[:i], authority_path[i:]))
    i = authority.rfind("@")
    host_port = authority if i == -1 else authority[i + 1:]
    i = host_port.rfind(":")
    if i == -1:
        host, port = host_port, -1
    else:
        p = host_port[i + 1:]
        if p.isdigit() and p and int(p) <= 65535:
            host, port = host_port[:i], int(p)
        else:
            host, port = host_port, -1
    if not host:
        return None
    return (scheme, host.lower(), port, path, query, fragment)


def normalize_escapes(s):
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n and s[i + 1] in HEX and s[i + 2] in HEX:
            v = int(s[i + 1:i + 3], 16)
            if v < 128 and chr(v) in UNRESERVED:
                out.append(chr(v))
            else:
                out.append("%" + s[i + 1:i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def remove_dot_segments(path):
    out = []
    for seg in path.split("/"):
        if seg == ".":
            pass
        elif seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    joined = "/".join(out)
    ends_with_dot = path.endswith("/.") or path.endswith("/..")
    result = ("/" + joined) if (path.startswith("/") and not joined.startswith("/")) else joined
    if ends_with_dot and not result.endswith("/"):
        result += "/"
    return result


def canonicalize_parts(parts):
    scheme, host, port, path0, query, _frag = parts
    port_part = "" if (port == -1 or DEFAULT_PORTS.get(scheme) == port) else ":%d" % port
    p = remove_dot_segments(normalize_escapes(path0))
    path = p if p else "/"
    if not query:
        query_part = ""
    else:
        pairs = []
        for kv in query.split("&"):
            if not kv:
                continue
            i = kv.find("=")
            if i == -1:
                pairs.append((normalize_escapes(kv), None))
            else:
                pairs.append((normalize_escapes(kv[:i]), normalize_escapes(kv[i + 1:])))
        pairs.sort(key=lambda kv: (kv[0], kv[1] if kv[1] is not None else ""))
        if not pairs:
            query_part = ""
        else:
            query_part = "?" + "&".join(
                k if v is None else "%s=%s" % (k, v) for k, v in pairs)
    return "%s://%s%s%s%s" % (scheme, host, port_part, path, query_part)


def canonicalize(url):
    parts = url_split(url)
    if parts is None:
        return "" if url is None else url.strip().lower()
    return canonicalize_parts(parts)


def fingerprint(url):
    return hashlib.sha1(("GET " + canonicalize(url)).encode("utf-8")).hexdigest()


def host_of(url):
    parts = url_split(url)
    return parts[1] if parts else ""


def path_of(url):
    parts = url_split(url)
    if not parts:
        return "/"
    return parts[3] if parts[3] else "/"


def resolve(base, href):
    """RFC 3986 resolution with onion-crawl guards (contract R3)."""
    if href is None or base is None:
        return None
    h = href.strip()
    if (not h or h.startswith("#") or h.startswith("javascript:")
            or h.startswith("mailto:") or h.startswith("data:")):
        return None
    try:
        resolved = h if "://" in h else urljoin(base, h)
    except ValueError:
        return None
    parts = url_split(resolved)
    return canonicalize_parts(parts) if parts else None


# ---------------------------------------------------------------------------
# Span extraction (contract: SURVEY §3.7 R4-R9 / §3.10 U5 — regexes as
# written; span order by offset; link pos global per document)
# ---------------------------------------------------------------------------

HREF_RX = re.compile(r"""href\s*=\s*["']([^"'\s>]+)["']""", re.I)
TITLE_RX = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
ONION_RX = re.compile(r"([a-z2-7]{16}|[a-z2-7]{56})\.onion")
EMAIL_RX = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
BTC_RX = re.compile(r"\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\b")
SSHFP_RX = re.compile(r"SHA256:[A-Za-z0-9]{43}")
PORT_RX = re.compile(r"\b(\d{1,5})/tcp open")
SERVER_RX = re.compile(r"^server:\s*(\S[^\r\n]*)", re.I | re.M)
POWERED_RX = re.compile(r"^x-powered-by:\s*(\S[^\r\n]*)", re.I | re.M)


WORD_RX = re.compile(r"[A-Za-z0-9_]+")


def fast_terms(s):
    """Twin of the engine's fast_terms tokenizer (TextOps.fastTerms):
    maximal [A-Za-z0-9_]+ runs, length >= 2, lowercased, distinct in
    first-occurrence order. (The synthetic corpus is pure ASCII, so the
    engine's ASCII fast path is the whole contract here.)"""
    out, seen = [], set()
    for m in WORD_RX.finditer(s):
        t = m.group(0)
        if len(t) > 1:
            t = t.lower()
            if t not in seen:
                seen.add(t)
                out.append(t)
    return out


def distinct_in_order(xs):
    seen = set()
    out = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def parse_doc(base_url, spans):
    """spans: list of (kind, text, media_ref, offset). Returns a dict."""
    ordered = sorted(spans, key=lambda s: s[3])
    texts = [s[1] for s in ordered if s[0] == "text" and s[1] is not None]
    media = [s[2] for s in ordered if s[0] == "media" and s[2] is not None]
    headers = [s[1] for s in ordered if s[0] == "header" and s[1] is not None]
    joined = "\n".join(texts)
    header_text = "\n".join(headers)

    m = TITLE_RX.search(joined)
    title = m.group(1).strip()[:255] if m else ""

    links = []  # (dst_url, pos) — pos global across the document, kept links only
    pos = 0
    for t in texts:
        for m in HREF_RX.finditer(t):
            abs_url = resolve(base_url, m.group(1))
            if abs_url is not None and is_onion_host(host_of(abs_url)):
                links.append((abs_url, pos))
                pos += 1

    onions = distinct_in_order(m.group(0).lower() for m in ONION_RX.finditer(joined))
    emails = distinct_in_order(m.group(0) for m in EMAIL_RX.finditer(joined))
    btcs = distinct_in_order(m.group(0) for m in BTC_RX.finditer(joined))
    ssh_fps = distinct_in_order(m.group(0) for m in SSHFP_RX.finditer(joined))
    ports = distinct_in_order(m.group(1) for m in PORT_RX.finditer(joined))

    sm = SERVER_RX.search(header_text)
    pm = POWERED_RX.search(header_text)
    return {
        "url": base_url,
        "host": host_of(base_url),
        "title": title,
        "body_text": joined,
        "content_sha1": hashlib.sha1(joined.encode("utf-8")).hexdigest(),
        "links": links,
        "media_refs": media,
        "onions": onions,
        "emails": emails,
        "btcs": btcs,
        "ssh_fps": ssh_fps,
        "ports": ports,
        "server": sm.group(1).strip()[:255] if sm else "",
        "powered_by": pm.group(1).strip()[:255] if pm else "",
    }


# ---------------------------------------------------------------------------
# Synthetic corpus (contract: FIXTURES.md B1 — pure functions of
# (hostIdx, pageIdx); re-derived from the documented generator recipe)
# ---------------------------------------------------------------------------

BASE32 = "abcdefghijklmnopqrstuvwxyz234567"
WORDS = ["onion", "market", "forum", "mirror", "hidden", "service", "index",
         "directory", "fresh", "links", "secure", "anon", "wiki", "board",
         "chat", "mail", "host", "search", "paste", "drop"]
SERVERS = ["nginx/1.14.2", "Apache/2.4.38", "Caddy", "lighttpd/1.4.53"]
POWERED_BYS = ["PHP/7.3.4", "Express", "Django/2.2", ""]
BOMB_HOST = 4
BOMB_SUBDOMAINS = 25


def host_name(i):
    ln = 56 if i % 7 == 0 else 16
    out = []
    h = mix((i * 31 + 7) & MASK64)
    for k in range(ln):
        if k % 12 == 0:
            h = mix((h + k) & MASK64)
        out.append(BASE32[(h >> ((k % 12) * 5)) & 31])
    return "".join(out) + ".onion"


def pages_per_host(i):
    return 3 + non_neg(mix((i * 13 + 1) & MASK64)) % 5


def clone_source(i):
    return i - 1 if i % 10 == 9 else i


def dead_from_round(i):
    return 2 if i % 11 == 3 else -1


def is_ghost(i):
    return i % 13 == 5


def url_of(i, p):
    return ("http://%s/" % host_name(i)) if p == 0 else \
        ("http://%s/p%d?a=1&b=2" % (host_name(i), p))


def pick(h, n):
    return non_neg(h) % n


def cross_target(i, p, n_hosts, slot):
    h = mix((i * 1009 + p * 131 + slot) & MASK64)
    if non_neg(h) % 10 < 3 and i != 0:
        return 0
    return pick(mix((h + 1) & MASK64), n_hosts)


def filler_text(seed, n):
    out = []
    h = seed
    for _ in range(n):
        h = mix(h)
        out.append(WORDS[non_neg(h) % len(WORDS)])
    return " ".join(out)


def title_of(i, p):
    src = clone_source(i)
    return "%s %d-%d" % (filler_text(mix((src * 97 + p) & MASK64), 3), src % 1000, p)


def btc_of(seed):
    alpha = "abcdefghijkmnopqrstuvwxyzABCDEFGHJKLMNPQRSTUVWXYZ123456789"
    out = ["1"]
    h = seed & MASK64
    for k in range(30):
        if k % 10 == 0:
            h = mix((h + k) & MASK64)
        out.append(alpha[non_neg(h >> ((k % 10) * 6)) % len(alpha)])
    return "".join(out)


def email_of(i):
    src = clone_source(i)
    return "admin%d@mail%d.onion" % (src % 50, src % 20)


def ssh_fp_of(i):
    alpha = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")
    src = clone_source(i)
    out = ["SHA256:g"]
    h = mix((src * 41 + 11) & MASK64)
    for k in range(42):
        if k % 10 == 0:
            h = mix((h + k) & MASK64)
        out.append(alpha[non_neg(h >> ((k % 10) * 6)) % len(alpha)])
    return "".join(out)


def ports_of(i):
    src = clone_source(i)
    ps = [22, 80]
    if src % 3 == 0:
        ps.append(443)
    if src % 4 == 1:
        ps.append(8080)
    return ps


def server_of(i):
    return SERVERS[non_neg(mix((i * 53 + 3) & MASK64)) % len(SERVERS)]


def powered_by_of(i):
    return POWERED_BYS[non_neg(mix((i * 59 + 5) & MASK64)) % len(POWERED_BYS)]


def spans_of(i, p, n_hosts):
    """list of (kind, text, media_ref, offset) in document order."""
    src = clone_source(i)
    host = host_name(i)
    src_host = host_name(src)
    np = pages_per_host(src)
    spans = []
    off = [0]

    def text(t):
        spans.append(("text", t, None, off[0]))
        off[0] += 1

    def media(r):
        spans.append(("media", None, r, off[0]))
        off[0] += 1

    def header(t):
        spans.append(("header", t, None, off[0]))
        off[0] += 1

    pb = powered_by_of(i)
    header("Server: %s%s" % (server_of(i),
                             ("\nX-Powered-By: %s" % pb) if pb else ""))

    text("<title>%s</title> %s" % (title_of(i, p),
                                   filler_text(mix((src * 7 + p) & MASK64), 8)))

    sb = []
    nxt = (p + 1) % np
    rel = (p + 2) % np
    if nxt == 0:
        sb.append('<a href="/">next</a> ')
    else:
        sb.append('<a href="/p%d?b=2&a=1">next</a> ' % nxt)
    if rel == 0:
        sb.append('<a href="/#top">rel</a> ')
    else:
        sb.append('<a href="p%d?b=2&a=1">rel</a> ' % rel)
    for s in range(2):
        t = cross_target(src, p, n_hosts, s)
        sb.append('<a href="http://%s/">x%d</a> ' % (host_name(t), s))
    if nxt != 0:
        sb.append('<a href="http://%s/p%d?a=1&b=2#frag">dup</a> ' % (src_host, nxt))
    if p == 0:
        sb.append('<a href="/private/area">members</a> ')
    text("".join(sb))

    media("http://%s/img/%d.png" % (host, p))

    mention = host_name(pick(mix((src * 17 + p * 3) & MASK64), n_hosts))
    text("find us also at %s contact %s donate %s %s" % (
        mention, email_of(i), btc_of((src * 23 + p) & MASK64),
        filler_text(mix((src * 29 + p) & MASK64), 6)))

    if p == 0:
        text("ssh host key %s %s" % (
            ssh_fp_of(i),
            " ".join("port %d/tcp open" % pt for pt in ports_of(i))))

    if i == BOMB_HOST and p == 1 and n_hosts > BOMB_HOST:
        text(" ".join('<a href="http://sub%d.%s/">s%d</a>' % (k, host, k)
                      for k in range(BOMB_SUBDOMAINS)))
    return spans


def docs_local(n_hosts):
    docs = {}
    for i in range(n_hosts):
        if is_ghost(i):
            continue
        for p in range(pages_per_host(i)):
            docs[url_of(i, p)] = spans_of(i, p, n_hosts)
    return docs


def robots_local(n_hosts):
    """list of (host, path_prefix, allow, crawl_delay)."""
    rules = []
    for i in range(n_hosts):
        if i % 5 == 0 and i != 0:
            rules.append((host_name(i), "/private", False, 15.0))
            rules.append((host_name(i), "/", True, 15.0))
    rules.append((host_name(0), "/", True, 2.0))
    return rules


def host_deaths_local(n_hosts):
    return {host_name(i): dead_from_round(i)
            for i in range(n_hosts) if dead_from_round(i) >= 0}


def seeds_local(n_hosts, k):
    base = [url_of(i, 0) for i in range(min(k, n_hosts))]
    dup_variant = ["http://%s/#top" % host_name(0).upper()]
    ghost = [url_of(i, 0) for i in range(n_hosts) if is_ghost(i)][:1]
    denied = ["http://%s/private/area" % host_name(5)]
    return base + dup_variant + ghost + denied


# ---------------------------------------------------------------------------
# Enqueue sequence (contract: SURVEY §6.3)
# ---------------------------------------------------------------------------

def seq_for_seed(canon_url):
    return fnv1a64(canon_url) & 0xfffffffffff


def seq_for_discovered(enqueue_round, parent_canon, link_pos):
    return ((enqueue_round << 44)
            | ((fnv1a64(parent_canon) & 0xffffffff) << 12)
            | min(link_pos, 4095))


def seq_for_requeue(enqueue_round, canon_url):
    return (enqueue_round << 44) | (fnv1a64(canon_url) & 0xfffffffffff)


# ---------------------------------------------------------------------------
# The crawl replay (contract: SURVEY §6 items 1-6; config FIXTURES.md B4)
# ---------------------------------------------------------------------------

P_NEW, P_RECRAWL, P_RETRY = 2, 1, 0
T_NEW, T_RECRAWL, T_RETRY = "new", "recrawl", "retry"
BASE_RX = re.compile(r"([a-z2-7]{16}|[a-z2-7]{56})\.onion$")
INT_MAX = 2 ** 31 - 1


class Config:
    max_depth = 3
    max_pages_per_domain = 12
    round_window_sec = 60.0
    default_crawl_delay_sec = 10.0
    dead_retire_threshold = 3
    recrawl_interval_rounds = 2
    crap_subdomain_limit = 20
    max_url_retries = 2
    min_delay_sec = 1.0
    compact_every_rounds = 2  # FTS index maintenance cadence (FIXTURES B4)


def total_order_key(entry):
    """(priority DESC, enqueue_seq ASC, url ASC) — entry is a frontier dict."""
    return (-entry["priority"], entry["enqueue_seq"], entry["url"])


def run_crawl(n_hosts, rounds, seed_k=8, cfg=Config()):
    docs = docs_local(n_hosts)
    corpus_hosts = {host_of(u) for u in docs}
    deaths = host_deaths_local(n_hosts)
    robots = {}
    for host, prefix, allow, delay in robots_local(n_hosts):
        robots.setdefault(host, []).append((prefix, allow, delay))
    for host in robots:
        robots[host].sort(key=lambda r: (-len(r[0]), r[0]))

    def gate(host, url):
        rules = robots.get(host)
        if rules is None:
            return True, cfg.default_crawl_delay_sec
        path = path_of(url)
        for prefix, allow, delay in rules:
            if path.startswith(prefix):
                return allow, (delay if delay > 0 else cfg.default_crawl_delay_sec)
        return True, cfg.default_crawl_delay_sec

    # --- init (snapshot 0): seed frontier + seed seen -----------------------
    seen = {}       # fingerprint -> (url, first_round)
    canon_seeds = distinct_in_order(canonicalize(u) for u in seeds_local(n_hosts, seed_k))
    frontier = []   # list of dicts
    for u in canon_seeds:
        frontier.append(dict(url=u, host=host_of(u), priority=P_NEW, tier=T_NEW,
                             depth=0, enqueue_seq=seq_for_seed(u),
                             discovered_from="", round=1, retries=0))
        seen[fingerprint(u)] = (u, 1)

    domains = {}    # host -> dict of DomainRow fields
    pages = []      # accumulated PageRow dicts (url, host, status, title,
                    #   is_frontpage, visited_round, content_sha1)
    crawl_log = []  # (seq, round, url, host, priority)
    links = []      # (src_url, dst_url, src_host, dst_host, round) — every
                    #   kept anchor of every fetched page, per round (append)
    media_refs = [] # (url, host, media_ref, pos, round) — span-ordered
    facts = {"emails": [], "btc_addresses": [], "ssh_fps": [],
             "open_ports": []}  # each: (host, value, round), per-round distinct
    fts = []        # (term, url, host, in_title, round) — RAW postings,
                    #   per-page distinct via the tokenizer, NOT cross-page
                    #   deduplicated (mirrors the engine's zero-shuffle
                    #   append; duplicates collapse query-side)
    metrics = []    # (round, urls_in, denied, deduped, scheduled, fetched,
                    #   new_onions) — the engine's metrics table carries
                    #   per-PARTITION lineage the twin cannot (and need not)
                    #   replay; the per-round SUMS are deterministic and are
                    #   exactly what crawl09_metrics aggregates
    seq_base = 0

    for rnd in range(1, rounds + 1):
        if not frontier:
            break

        urls_in = len(frontier)

        # ---- 1. eligibility: drop retired + crap hosts ---------------------
        eligible = []
        for e in frontier:
            d = domains.get(e["host"])
            if d is not None and d["is_crap"]:
                continue
            if (d["dead_in_a_row"] if d else 0) >= cfg.dead_retire_threshold:
                continue
            pages_crawled = d["pages_crawled"] if d else 0
            eligible.append((e, pages_crawled))

        # ---- 2. robots gate: denied rows consumed, never fetched -----------
        allowed = []
        for e, pc in eligible:
            ok, delay = gate(e["host"], e["url"])
            if ok:
                allowed.append((e, pc, delay))

        # ---- 3. politeness budget: top-cap per host in the total order -----
        budget_cap = max(1, math.floor(cfg.round_window_sec / cfg.min_delay_sec))
        by_host = {}
        for e, pc, delay in allowed:
            by_host.setdefault(e["host"], []).append((e, pc, delay))
        scheduled = []
        carryover = []
        for host, entries in by_host.items():
            entries.sort(key=lambda t: total_order_key(t[0]))
            for rank, (e, pc, delay) in enumerate(entries, start=1):
                budget = min(max(1, math.floor(cfg.round_window_sec / delay)), budget_cap)
                cap = min(budget, max(0, cfg.max_pages_per_domain - pc))
                if rank <= cap:
                    scheduled.append(e)
                else:
                    c = dict(e)
                    c["round"] = rnd + 1
                    carryover.append(c)

        # ---- 4. golden crawl log: global total order, dense sequence -------
        scheduled.sort(key=total_order_key)
        for k, e in enumerate(scheduled, start=1):
            crawl_log.append((seq_base + k, rnd, e["url"], e["host"], e["priority"]))
        seq_base += len(scheduled)

        # ---- 5. corpus fetch join (outcome model: 200 / 404 / conn-fail) ---
        fetched = []    # (entry, parsed)
        misses = []     # entries on dead hosts (connection failures)
        not_found = []  # entries: live host, absent doc (permanent 404)
        alive_by_host = {}   # host -> fetched_pages (count of alive rows)
        for e in scheduled:
            host_alive = (e["host"] in corpus_hosts
                          and deaths.get(e["host"], INT_MAX + 1) > rnd)
            doc = docs.get(e["url"]) if host_alive else None
            if not host_alive:
                misses.append(e)
            elif doc is None:
                not_found.append(e)
                alive_by_host.setdefault(e["host"], 0)
            else:
                parsed = parse_doc(e["url"], doc)
                fetched.append((e, parsed))
                alive_by_host[e["host"]] = alive_by_host.get(e["host"], 0) + 1

        # ---- 7. pages delta -------------------------------------------------
        pages_delta = []
        for e, p in fetched:
            pages_delta.append(dict(url=e["url"], host=e["host"], status=200,
                                    title=p["title"],
                                    is_frontpage=path_of(e["url"]) == "/",
                                    visited_round=rnd,
                                    content_sha1=p["content_sha1"]))
        for e in misses:
            pages_delta.append(dict(url=e["url"], host=e["host"], status=0,
                                    title="", is_frontpage=path_of(e["url"]) == "/",
                                    visited_round=rnd, content_sha1=None))
        for e in not_found:
            pages_delta.append(dict(url=e["url"], host=e["host"], status=404,
                                    title="", is_frontpage=path_of(e["url"]) == "/",
                                    visited_round=rnd, content_sha1=None))

        # ---- 7b. links / media / harvest-fact deltas (append sinks) --------
        # Mirrors the engine's per-round deltas exactly: links keep EVERY
        # kept anchor (no dedup), media refs ride span order with their
        # posexplode index, and each fact table is distinct over
        # (host, value) within the round (in-page extraction is already
        # distinct-in-order on both sides).
        round_facts = {k: set() for k in facts}
        for e, p in fetched:
            for dst, _pos in p["links"]:
                links.append((e["url"], dst, e["host"], host_of(dst), rnd))
            for mpos, ref in enumerate(p["media_refs"]):
                media_refs.append((e["url"], e["host"], ref, mpos, rnd))
            for key, vals in (("emails", p["emails"]), ("btc_addresses", p["btcs"]),
                              ("ssh_fps", p["ssh_fps"]), ("open_ports", p["ports"])):
                for v in vals:
                    round_facts[key].add((e["host"], v))
        for key, pairs in round_facts.items():
            facts[key].extend((h, v, rnd) for h, v in pairs)
        for e, p in fetched:
            for t in fast_terms(p["title"]):
                fts.append((t, e["url"], e["host"], True, rnd))
            for t in fast_terms(p["body_text"]):
                fts.append((t, e["url"], e["host"], False, rnd))
        # FTS index maintenance (the engine's compactEveryRounds cadence):
        # collapse the RAW per-round postings to unique (term, url, host) —
        # title flag preserved (max: true wins), latest observation round.
        # Rounds after the last compaction stay raw, exactly like the
        # engine's post-compaction deltas.
        if rnd % cfg.compact_every_rounds == 0:
            grouped = {}
            for (t, u, h, it, r) in fts:
                k = (t, u, h)
                cur = grouped.get(k)
                grouped[k] = ((it or cur[0]), max(r, cur[1])) if cur else (it, r)
            fts = [(t, u, h, it, r) for (t, u, h), (it, r) in grouped.items()]

        # ---- 8. discoveries: anchors (span order) + onion mentions ----------
        candidates = []  # (fingerprint, url, host, depth, enqueue_seq, discovered_from)
        for e, p in fetched:
            depth = e["depth"] + 1
            if depth <= cfg.max_depth:
                for dst, pos in p["links"]:
                    candidates.append((fingerprint(dst), dst, host_of(dst), depth,
                                       seq_for_discovered(rnd + 1, e["url"], pos),
                                       e["url"]))
                for mpos, mhost in enumerate(p["onions"]):
                    u = "http://%s/" % mhost
                    candidates.append((fingerprint(u), u, host_of(u), depth,
                                       seq_for_discovered(rnd + 1, e["url"], mpos + 2048),
                                       e["url"]))

        # batch dedup: best entry per fingerprint by (enqueue_seq, discovered_from)
        best = {}
        for c in candidates:
            fp = c[0]
            if fp not in best or (c[4], c[5]) < (best[fp][4], best[fp][5]):
                best[fp] = c

        # fresh = not in committed seen
        fresh0 = [c for fp, c in best.items() if fp not in seen]

        # subdomain-spam bases (F6): > crapSubdomainLimit distinct hosts per base
        base_hosts = {}
        for c in fresh0:
            m = BASE_RX.search(c[2])
            base = m.group(0) if m else ""
            if base:
                base_hosts.setdefault(base, set()).add(c[2])
        crap_bases = {b for b, hs in base_hosts.items()
                      if len(hs) > cfg.crap_subdomain_limit}

        def base_of(host):
            m = BASE_RX.search(host)
            return m.group(0) if m else ""

        fresh = [c for c in fresh0 if base_of(c[2]) not in crap_bases]

        # seen delta (enters seen at ENQUEUE time — §6.5)
        for fp, url, *_ in fresh:
            seen[fp] = (url, rnd + 1)

        new_entries = [dict(url=u, host=h, priority=P_NEW, tier=T_NEW, depth=d,
                            enqueue_seq=sq, discovered_from=df, round=rnd + 1,
                            retries=0)
                       for (fp, u, h, d, sq, df) in fresh]

        # ---- 9. retry tier ---------------------------------------------------
        miss_hosts = {}
        for e in misses:
            if e["host"] not in miss_hosts:
                prior = domains.get(e["host"])
                miss_hosts[e["host"]] = (prior["dead_in_a_row"] if prior else 0) + 1
        retry_entries = []
        for e in misses:
            if (e["retries"] < cfg.max_url_retries
                    and miss_hosts[e["host"]] < cfg.dead_retire_threshold):
                retry_entries.append(dict(
                    url=e["url"], host=e["host"], priority=P_RETRY, tier=T_RETRY,
                    depth=e["depth"],
                    enqueue_seq=seq_for_requeue(rnd + 1, e["url"]),
                    discovered_from="", round=rnd + 1, retries=e["retries"] + 1))

        # ---- 10. recrawl tier: stalest-first due domains ---------------------
        recrawl_entries = []
        for host, d in domains.items():
            if (d["is_up"] and not d["is_crap"]
                    and d["dead_in_a_row"] < cfg.dead_retire_threshold
                    and d["last_visited_round"] <= rnd - cfg.recrawl_interval_rounds):
                u = "http://%s/" % host
                recrawl_entries.append(dict(
                    url=u, host=host, priority=P_RECRAWL, tier=T_RECRAWL, depth=0,
                    enqueue_seq=seq_for_requeue(rnd + 1, u),
                    discovered_from="", round=rnd + 1, retries=0))

        # ---- 11. next frontier: best entry per url ---------------------------
        merged = {}
        for e in carryover + new_entries + retry_entries + recrawl_entries:
            u = e["url"]
            key = (P_NEW - e["priority"], e["enqueue_seq"])
            if u not in merged or key < (P_NEW - merged[u]["priority"],
                                         merged[u]["enqueue_seq"]):
                merged[u] = e
        frontier = list(merged.values())

        # ---- 12. domains merge (K1 upsert) -----------------------------------
        # clone first-seen ranks come from the COMMITTED (pre-merge) table
        first_seen_committed = {h: d["first_seen_round"] for h, d in domains.items()}
        # per-host observations from this round's fetches
        fp_title = {}
        obs_server = {}
        obs_powered = {}
        for e, p in fetched:
            h = e["host"]
            if path_of(e["url"]) == "/":
                t = p["title"]
                if h not in fp_title or t > fp_title[h]:
                    fp_title[h] = t
            if p["server"]:
                if h not in obs_server or p["server"] > obs_server[h]:
                    obs_server[h] = p["server"]
            if p["powered_by"]:
                if h not in obs_powered or p["powered_by"] > obs_powered[h]:
                    obs_powered[h] = p["powered_by"]

        obs_hosts = set(alive_by_host) | set(miss_hosts)

        # per-round metrics sums (engine: Round step 13 tagged union):
        # urls_in = frontier rows entering the round; denied = eligible
        # rows failing the robots gate; deduped = best-per-fingerprint
        # candidates dropped as already-seen or crap-base; new_onions =
        # next-frontier hosts in neither the committed domains nor this
        # round's observations (discovered but not yet visited)
        new_onion_hosts = ({e["host"] for e in frontier}
                           - set(domains) - obs_hosts)
        metrics.append((rnd, urls_in, len(eligible) - len(allowed),
                        len(best) - len(fresh), len(scheduled),
                        len(fetched), len(new_onion_hosts)))
        for host in set(domains) | obs_hosts:
            d = domains.get(host)
            fetched_pages = alive_by_host.get(host)   # None if not host-alive this round
            dead_now = miss_hosts.get(host)
            is_bomb = base_of(host) in crap_bases
            row = dict(
                host=host,
                first_seen_round=(d["first_seen_round"] if d else rnd),
                last_visited_round=(rnd if (fetched_pages is not None or dead_now is not None)
                                    else (d["last_visited_round"] if d else -1)),
                last_alive_round=(rnd if fetched_pages is not None
                                  else (d["last_alive_round"] if d else -1)),
                is_up=(True if fetched_pages is not None
                       else (False if dead_now is not None
                             else (d["is_up"] if d else False))),
                dead_in_a_row=(0 if fetched_pages is not None
                               else (dead_now if dead_now is not None
                                     else (d["dead_in_a_row"] if d else 0))),
                title=(fp_title.get(host) or (d["title"] if d else "") or ""),
                server=(obs_server.get(host) or (d["server"] if d else "") or ""),
                powered_by=(obs_powered.get(host) or (d["powered_by"] if d else "") or ""),
                is_crap=((d["is_crap"] if d else False) or is_bomb),
                is_fake=False,
                genuine_host="",
                pages_crawled=(d["pages_crawled"] if d else 0) + (fetched_pages or 0),
            )
            domains[host] = row

        # clone / fake marking over the ACCUMULATED front pages; first-seen
        # ranks come from the committed (pre-merge) table — hosts absent
        # there rank as newest (INT_MAX), tie-break by host name.
        pages.extend(pages_delta)
        latest_fp_sha = {}  # host -> (visited_round, sha1)
        for p in pages:
            if p["is_frontpage"] and p["content_sha1"] is not None:
                cur = latest_fp_sha.get(p["host"])
                if cur is None or p["visited_round"] > cur[0]:
                    latest_fp_sha[p["host"]] = (p["visited_round"], p["content_sha1"])
        groups = {}
        for host, (_, sha) in latest_fp_sha.items():
            groups.setdefault(sha, []).append(host)
        for sha, hosts in groups.items():
            if len(set(hosts)) > 1:
                genuine = min(hosts, key=lambda h: (first_seen_committed.get(h, INT_MAX), h))
                for h in hosts:
                    if h in domains:
                        domains[h]["is_fake"] = (h != genuine)
                        domains[h]["genuine_host"] = genuine

        # snapshot the committed first_seen ranks for NEXT round's clone pass
        first_seen_committed = {h: d["first_seen_round"] for h, d in domains.items()}

    return crawl_log, seen, domains, pages, links, media_refs, facts, fts, metrics


# ---------------------------------------------------------------------------
# Output formatting + diff
# ---------------------------------------------------------------------------

def fmt_bool(b):
    return "true" if b else "false"


def crawl_log_lines(crawl_log):
    return ["%d\t%d\t%s\t%s\t%d" % e for e in crawl_log]


def seen_lines(seen):
    return ["%s\t%s" % (fp, url) for fp, (url, _r) in sorted(seen.items())]


def domains_lines(domains):
    out = []
    for host in sorted(domains):
        d = domains[host]
        out.append("\t".join([
            host, fmt_bool(d["is_up"]), str(d["dead_in_a_row"]),
            str(d["first_seen_round"]), str(d["last_visited_round"]),
            str(d["last_alive_round"]), fmt_bool(d["is_fake"]),
            d["genuine_host"], str(d["pages_crawled"]),
            d["server"], d["powered_by"]]))
    return out


def pages_lines(pages):
    rows = sorted(pages, key=lambda p: (p["url"], p["visited_round"], p["status"]))
    return ["\t".join([p["url"], p["host"], str(p["status"]), p["title"],
                       fmt_bool(p["is_frontpage"]), str(p["visited_round"]),
                       p["content_sha1"] if p["content_sha1"] is not None else ""])
            for p in rows]


def links_lines(links):
    return ["%s\t%s\t%s\t%s\t%d" % l for l in sorted(links)]


def media_lines(media_refs):
    return ["%s\t%s\t%s\t%d\t%d" % m for m in sorted(media_refs)]


def fact_lines(rows):
    return ["%s\t%s\t%d" % r for r in sorted(rows)]


def metrics_lines(metrics):
    return ["%d\t%d\t%d\t%d\t%d\t%d\t%d" % m for m in sorted(metrics)]


def fts_lines(fts):
    return ["%s\t%s\t%s\t%s\t%d" % (t, u, h, fmt_bool(it), r)
            for (t, u, h, it, r) in sorted(fts)]


# ---------------------------------------------------------------------------
# Analytic crawl-query outputs (crawl04..crawl13) — re-derived from the
# twin's OWN tables, so each downstream query is cross-implementation
# pinned end to end (inputs AND aggregation), not just via its inputs.
# crawl14 (PageRank) is deliberately absent: it iterates in floating
# point, where summation order is execution-layout detail; RankSpec pins
# it against a dense local reference instead.
# ---------------------------------------------------------------------------

def q_crawl04_lines(links):
    outd = {}
    ind = {}
    for (src, dst, sh, dh, _r) in links:
        outd.setdefault(sh, set()).add(dh)
        ind.setdefault(dh, set()).add(sh)
    hosts = set(outd) | set(ind)
    rows = [(h, len(outd.get(h, ())), len(ind.get(h, ()))) for h in hosts]
    rows.sort(key=lambda r: (-r[2], r[0]))
    return ["%s\t%d\t%d" % r for r in rows[:20]]


def q_crawl05_lines(fts, query="hidden market directory", page=0, page_size=10):
    terms = distinct_in_order(
        t for t in re.split(r"\W+", query.lower()) if len(t) > 1)
    # committed-index dedup: (term,url,host) -> OR(in_title)
    hit = {}
    for (t, u, h, it, _r) in fts:
        if t in terms:
            k = (t, u, h)
            hit[k] = hit.get(k, False) or it
    per_page = {}
    for (t, u, h), it in hit.items():
        m, th = per_page.get((u, h), (set(), 0))
        m.add(t)
        per_page[(u, h)] = (m, th + (1 if it else 0))
    rows = [(u, h, len(m) + 2 * th, len(m), th)
            for (u, h), (m, th) in per_page.items()]
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:(page + 1) * page_size]
    return ["%d\t%s\t%s\t%d\t%d\t%d" % ((i + 1,) + r)
            for i, r in enumerate(rows) if i + 1 > page * page_size]


def q_top_facts_lines(rows, k):
    by_val = {}
    for (h, v, _r) in rows:
        by_val.setdefault(v, set()).add(h)
    out = [(v, len(hs)) for v, hs in by_val.items()]
    out.sort(key=lambda r: (-r[1], r[0]))
    return ["%s\t%d" % r for r in out[:k]]


def q_crawl07_lines(domains):
    return ["%s\t%s" % (h, domains[h]["genuine_host"])
            for h in sorted(domains) if domains[h]["is_fake"]]


def q_crawl08_lines(pages):
    up = {}  # (host, round) -> up_now
    for p in pages:
        k = (p["host"], p["visited_round"])
        up[k] = max(up.get(k, 0), 1 if p["status"] > 0 else 0)
    out = []
    by_host = {}
    for (h, r), u in up.items():
        by_host.setdefault(h, []).append((r, u))
    for h in sorted(by_host):
        prev = None
        for r, u in sorted(by_host[h]):
            if prev is not None and prev != u:
                out.append((h, r, "went_up" if u == 1 else "went_down"))
            prev = u
    return ["%s\t%d\t%s" % t for t in sorted(out)]


def q_crawl10_lines(domains, pages):
    n_pages = {}
    for p in pages:
        n_pages[p["host"]] = n_pages.get(p["host"], 0) + 1
    rows = [(h, domains[h]["is_up"], n_pages.get(h, 0)) for h in domains]
    rows.sort(key=lambda r: (-r[2], r[0]))
    return ['{"host":"%s","is_up":%s,"n_pages":%d}' % (h, fmt_bool(up), n)
            for (h, up, n) in rows[:15]]


def q_crawl11_lines(ssh_fps, domains):
    by_fp = {}
    for (h, v, _r) in ssh_fps:
        by_fp.setdefault(v, set()).add(h)
    out = []
    for fp in sorted(by_fp):
        hosts = by_fp[fp]
        if len(hosts) <= 1:
            continue
        for h in sorted(hosts):
            d = domains.get(h)
            out.append("%s\t%s\t%s\t%s" % (
                fp, h,
                fmt_bool(d["is_fake"]) if d else "",
                d["genuine_host"] if d else ""))
    return out


def q_crawl12_lines(open_ports):
    last = {}
    for (h, v, r) in open_ports:
        k = (h, int(v))
        last[k] = max(last.get(k, r), r)
    return ["%s\t%d\t%d" % (h, p, r)
            for (h, p), r in sorted(last.items())]


def q_crawl13_lines(media_refs):
    agg = {}
    for (_u, h, ref, _pos, r) in media_refs:
        last, n = agg.get((h, ref), (r, 0))
        agg[(h, ref)] = (max(last, r), n + 1)
    return ["%s\t%s\t%d\t%d" % (h, ref, last, n)
            for (h, ref), (last, n) in sorted(agg.items())]


def diff_lines(name, twin, engine):
    if twin == engine:
        print("OK   %s: %d lines match exactly" % (name, len(twin)))
        return True
    print("FAIL %s: twin %d lines vs engine %d lines" % (name, len(twin), len(engine)))
    shown = 0
    for i in range(max(len(twin), len(engine))):
        a = twin[i] if i < len(twin) else "<missing>"
        b = engine[i] if i < len(engine) else "<missing>"
        if a != b:
            print("  line %d:\n    twin  : %s\n    engine: %s" % (i + 1, a, b))
            shown += 1
            if shown >= 5:
                break
    return False


def read_lines(path):
    with open(path, encoding="utf-8") as f:
        return [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nhosts", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--seed-k", type=int, default=8)
    ap.add_argument("--golden-dir", help="diff vs frozen goldens (crawl_log.tsv, seen.txt)")
    ap.add_argument("--engine-dir",
                    help="diff vs a live engine dump (crawl01_log.tsv, "
                         "crawl02_domains.tsv, crawl03_seen.tsv)")
    ap.add_argument("--out", help="write the twin's own tables to this dir")
    args = ap.parse_args()

    crawl_log, seen, domains, pages, links, media_refs, facts, fts, metrics = \
        run_crawl(args.nhosts, args.rounds, args.seed_k)
    log_l = crawl_log_lines(crawl_log)
    seen_l = seen_lines(seen)
    dom_l = domains_lines(domains)
    extra = [("pages.tsv", pages_lines(pages)),
             ("links.tsv", links_lines(links)),
             ("media_refs.tsv", media_lines(media_refs)),
             ("emails.tsv", fact_lines(facts["emails"])),
             ("btc_addresses.tsv", fact_lines(facts["btc_addresses"])),
             ("ssh_fps.tsv", fact_lines(facts["ssh_fps"])),
             ("open_ports.tsv", fact_lines(facts["open_ports"])),
             ("pages_fts.tsv", fts_lines(fts)),
             ("metrics.tsv", metrics_lines(metrics)),
             # analytic query outputs (crawl04..crawl13; crawl09 ≡ the
             # metrics sums above, crawl14 is FP-iterative — see comment
             # on the q_* helpers)
             ("q_crawl04_link_degrees.tsv", q_crawl04_lines(links)),
             ("q_crawl05_search.tsv", q_crawl05_lines(fts)),
             ("q_crawl06_top_emails.tsv", q_top_facts_lines(facts["emails"], 15)),
             ("q_crawl07_clones.tsv", q_crawl07_lines(domains)),
             ("q_crawl08_transitions.tsv", q_crawl08_lines(pages)),
             ("q_crawl10_sql_api.tsv", q_crawl10_lines(domains, pages)),
             ("q_crawl11_ssh_lookup.tsv", q_crawl11_lines(facts["ssh_fps"], domains)),
             ("q_crawl12_ports.tsv", q_crawl12_lines(facts["open_ports"])),
             ("q_crawl13_media.tsv", q_crawl13_lines(media_refs))]

    if args.out:
        import os
        os.makedirs(args.out, exist_ok=True)
        for name, lines in [("crawl01_log.tsv", log_l),
                            ("crawl02_domains.tsv", dom_l),
                            ("crawl03_seen.tsv", seen_l)] + extra:
            with open(os.path.join(args.out, name), "w", encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
        print("wrote twin tables to %s" % args.out)

    ok = True
    if args.golden_dir:
        # goldens: crawl_log.tsv matches our format; seen.txt is fingerprints only
        ok &= diff_lines("crawl_log vs golden", log_l,
                         read_lines(args.golden_dir + "/crawl_log.tsv"))
        ok &= diff_lines("seen fingerprints vs golden",
                         [ln.split("\t")[0] for ln in seen_l],
                         read_lines(args.golden_dir + "/seen.txt"))
    if args.engine_dir:
        import os
        ok &= diff_lines("crawl01_log", log_l,
                         read_lines(args.engine_dir + "/crawl01_log.tsv"))
        ok &= diff_lines("crawl02_domains", dom_l,
                         read_lines(args.engine_dir + "/crawl02_domains.tsv"))
        ok &= diff_lines("crawl03_seen", seen_l,
                         read_lines(args.engine_dir + "/crawl03_seen.tsv"))
        # the append sinks (engine dumps are optional so the spec can
        # adopt them table by table)
        for name, lines in extra:
            path = os.path.join(args.engine_dir, name)
            if os.path.exists(path):
                ok &= diff_lines(name[:-4], lines, read_lines(path))

    if not (args.golden_dir or args.engine_dir or args.out):
        print("nothing to do: pass --golden-dir / --engine-dir / --out")
        return 2
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
