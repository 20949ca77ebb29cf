#!/usr/bin/env python3
"""Leak scan over src/ + build files: asserts the repo derives from
public knowledge only (Spark API, the public reference repo, published
papers). Categories mirror the driver's scan; every hit is a
(file, line, excerpt) triple. The output is stamped with the commit
SHA and scan time so a fresh scan is distinguishable from a round-bump
edit of the committed artifact.

Usage: tools/leakcheck.py [round_number] > LEAKCHECK.json
"""
import json, os, re, subprocess, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# roots a Spark/Scala project may legitimately import
PUBLIC_IMPORT_ROOTS = (
    "scala", "java.", "javax.", "org.apache.", "graft",
    "org.scalatest", "org.scalacheck", "org.junit",
)
# domains public sources may cite
PUBLIC_DOMAINS = (
    "apache.org", "github.com", "arxiv.org", "duckdb.org", "w3.org",
    "scala-lang.org", "scala-sbt.org", "localhost", "example.com",
)

CATEGORIES = {
    "nonpublic-import": lambda line: (
        (m := re.match(r"\s*import\s+([A-Za-z0-9_.]+)", line))
        and not m.group(1).startswith(PUBLIC_IMPORT_ROOTS)
        # value imports from a local SparkSession (spark.implicits._)
        and ".implicits" not in m.group(1)),
    "nonpublic-url": lambda line: any(
        not any(d in u for d in PUBLIC_DOMAINS)
        for u in re.findall(r"https?://[^\s\"')>]+", line)),
    "object-store-uri": lambda line: re.search(
        r"\b(s3a?|gs|abfss?|wasbs?)://", line),
    "chat-link": lambda line: re.search(
        r"slack\.com|app\.slack|discord\.gg", line),
    "api-key-literal": lambda line: re.search(
        r"(key|token|secret|password)\s*[:=]\s*[\"'][A-Za-z0-9_\-]{16,}[\"']",
        line, re.I),
    "nonpublic-env": lambda line: any(
        not v.startswith(("SPARK_", "GRAFT_", "COURSIER", "JAVA_", "PATH",
                          "HOME", "TMPDIR", "USER"))
        for v in re.findall(r"sys\.env(?:\.get)?\([\"']([A-Z0-9_]+)[\"']", line)),
    "short-link": lambda line: re.search(r"\bgo/[a-z][a-z0-9-]+", line),
}

SCAN_EXT = (".scala", ".sbt", ".py", ".md")
SCAN_DIRS = ("src", "tools", "project")
SCAN_FILES = ("build.sbt",)


def files():
    for d in SCAN_DIRS:
        for dirpath, _, names in os.walk(os.path.join(ROOT, d)):
            for n in names:
                if n.endswith(SCAN_EXT):
                    yield os.path.join(dirpath, n)
    for f in SCAN_FILES:
        p = os.path.join(ROOT, f)
        if os.path.exists(p):
            yield p


def main():
    hits = {c: [] for c in CATEGORIES}
    for path in files():
        rel = os.path.relpath(path, ROOT)
        if rel == os.path.join("tools", "leakcheck.py"):
            continue  # the scanner's own pattern strings are not leaks
        scala = path.endswith((".scala", ".sbt"))
        with open(path, encoding="utf-8", errors="replace") as f:
            for i, line in enumerate(f, 1):
                for cat, pred in CATEGORIES.items():
                    if cat == "nonpublic-import" and not scala:
                        continue  # the import whitelist is Scala-specific
                    if pred(line):
                        hits[cat].append(f"{rel}:{i}: {line.strip()[:120]}")
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()
    out = {
        "round": int(sys.argv[1]) if len(sys.argv) > 1 else None,
        "commit": commit,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "generator": "tools/leakcheck.py",
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
