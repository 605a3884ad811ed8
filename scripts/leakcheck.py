#!/usr/bin/env python3
"""Proprietary-leak scan over the shipped sources.

Usage: python3 scripts/leakcheck.py [round_number]

Scans every tracked source/config file for pattern classes that would
indicate non-public content: imports outside the public-package allowlist,
non-public URLs, cloud bucket URIs, chat-tool links, API-key-shaped
strings, and credential-shaped environment variables. Writes
LEAKCHECK.json with run evidence (file count, byte count, UTC timestamp)
so a re-run is distinguishable from a hand-edited round bump.
"""
import sys, os, re, json, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN_DIRS = ["src", "project"]
SCAN_FILES = ["build.sbt", "Bench.scala", "Verify.scala"]
EXTS = {".scala", ".sbt", ".java", ".py", ".conf", ".properties", ".md"}

# Only TLD-rooted imports can name an external (possibly non-public)
# package; local/relative imports (import spark.implicits._, import
# SomeObject._) never can. Allowlist the public roots this build uses.
IMPORT_TLD = re.compile(r"^\s*import\s+(com|net|io|ai|dev|us|co|me|cloud|org)\.")
IMPORT_ALLOW = re.compile(
    r"^\s*import\s+(org\.apache\.|org\.scalatest|org\.scalacheck|"
    r"org\.slf4j|org\.xerial|com\.fasterxml|com\.google\.common|"
    r"io\.netty|org\.json4s|org\.roaringbitmap)")

# URL hosts considered public documentation/infrastructure.
URL_ALLOW = re.compile(
    r"https?://(www\.)?("
    r"apache\.org|spark\.apache\.org|github\.com|raw\.githubusercontent\.com|"
    r"mozilla\.org|addons\.mozilla\.org|docs\.telemetry\.mozilla\.org|"
    r"bugzilla\.mozilla\.org|scala-lang\.org|scalatest\.org|duckdb\.org|"
    r"example\.com|localhost|en\.wikipedia\.org|arxiv\.org|dl\.acm\.org)")
URL_ANY = re.compile(r"https?://[\w.-]+")

PATTERNS = {
    # s3a:// in a Scaladoc *about* cluster FS support is fine; a concrete
    # named bucket is not — require a path component after the authority.
    "cloud-bucket": re.compile(r"(s3a?|gs|abfss?)://[\w.-]+/[\w]"),
    "chat-link": re.compile(r"(slack\.com/archives|app\.slack\.com|#[a-z0-9-]*slack)"),
    "api-key": re.compile(r"(sk-[A-Za-z0-9]{20,}|AKIA[A-Z0-9]{16}|ghp_[A-Za-z0-9]{36})"),
    "credential-env": re.compile(r"env\.get\w*\(\s*\"[A-Z_]*(SECRET|TOKEN|PASSWORD|APIKEY|API_KEY)"),
}


def files():
    seen = []
    for d in SCAN_DIRS:
        for base, _, names in os.walk(os.path.join(ROOT, d)):
            for n in names:
                if os.path.splitext(n)[1] in EXTS:
                    seen.append(os.path.join(base, n))
    for f in SCAN_FILES:
        p = os.path.join(ROOT, f)
        if os.path.isfile(p):
            seen.append(p)
    return sorted(set(seen))


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {"nonpublic-import": [], "nonpublic-url": [], "cloud-bucket": [],
            "chat-link": [], "api-key": [], "credential-env": []}
    n_files = 0
    n_bytes = 0
    for path in files():
        rel = os.path.relpath(path, ROOT)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        n_files += 1
        n_bytes += len(text)
        for i, line in enumerate(text.splitlines(), 1):
            if IMPORT_TLD.match(line) and not IMPORT_ALLOW.match(line) \
                    and rel.endswith((".scala", ".sbt", ".java")):
                hits["nonpublic-import"].append(f"{rel}:{i}: {line.strip()[:120]}")
            for m in URL_ANY.finditer(line):
                if not URL_ALLOW.match(m.group(0)):
                    hits["nonpublic-url"].append(f"{rel}:{i}: {m.group(0)[:120]}")
            for key, pat in PATTERNS.items():
                if pat.search(line):
                    hits[key].append(f"{rel}:{i}: {line.strip()[:120]}")
    out = {
        "round": rnd,
        "generated_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_files_scanned": n_files,
        "n_bytes_scanned": n_bytes,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    dest = os.path.join(ROOT, "LEAKCHECK.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"scanned {n_files} files / {n_bytes} bytes -> "
          f"{out['n_hits']} hits -> {dest}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
