#!/usr/bin/env python3
"""Cross-library differential for graft's Unicode canonicalization
expressions (the doc_nfc_normalize discipline, case edition):

1. FULL-RANGE lowercase sweep — dumps the JDK's per-codepoint simple
   lowercase table (javac/java inline; `Character.toLowerCase(int)` is
   exactly what graft.functions.CodepointLower evaluates) and diffs it
   against DuckDB's `lower` (utf8proc tolower) over every defined
   codepoint. The ONLY allowed divergences are the three pinned
   Unicode-13 additions utf8proc's table predates (JDK maps them,
   utf8proc passes them through): U+A7C7, U+A7C9, U+A7F5.

2. strip_accents fixture — asserts DuckDB strips Mc (Devanagari vowel
   sign) and Me (enclosing mark) IN ADDITION to Mn, pinning the
   utf8proc STRIPMARK semantics graft.functions.StripAccents matches
   (the r14 ADVICE claimed Mn-only — measurably false; this gate keeps
   the record straight).

Usage: python3 tools/case_differential.py       # exits non-zero on drift
"""
import subprocess
import sys
import tempfile
import os

import duckdb

PINNED_LOWER_DIVERGENCES = {0xA7C7, 0xA7C9, 0xA7F5}

JAVA = """
import java.io.*;
public class LowerDump {
  public static void main(String[] a) throws Exception {
    PrintWriter w = new PrintWriter(new FileWriter(a[0]));
    for (int cp = 0; cp <= 0x10FFFF; cp++) {
      if (cp >= 0xD800 && cp <= 0xDFFF) continue;
      if (!Character.isDefined(cp)) continue;
      int lo = Character.toLowerCase(cp);
      if (lo != cp) w.println(cp + "\\t" + lo);
    }
    w.close();
  }
}
"""


def jdk_lower_map(tmp):
    src = os.path.join(tmp, "LowerDump.java")
    out = os.path.join(tmp, "jdk_lower.tsv")
    with open(src, "w") as f:
        f.write(JAVA)
    subprocess.run(["javac", src], check=True, cwd=tmp)
    subprocess.run(["java", "-cp", tmp, "LowerDump", out], check=True)
    m = {}
    for line in open(out):
        cp, lo = map(int, line.split())
        m[cp] = lo
    return m


def main():
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as tmp:
        jdk = jdk_lower_map(tmp)
    diffs = []
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        lo = con.execute("select lower(?)", [chr(cp)]).fetchone()[0]
        if lo != chr(jdk.get(cp, cp)):
            diffs.append(cp)
    unexpected = [hex(c) for c in diffs if c not in PINNED_LOWER_DIVERGENCES]
    print(f"lower sweep: {len(diffs)} JDK/utf8proc diffs "
          f"({[hex(c) for c in diffs]}), pinned "
          f"{sorted(hex(c) for c in PINNED_LOWER_DIVERGENCES)}")
    ok = True
    if unexpected:
        print(f"FAIL: unexpected lowercase divergences {unexpected}")
        ok = False

    # strip_accents: Mc and Me must be stripped (STRIPMARK), like
    # graft.functions.StripAccents does — see TextAnalysisSpec pins
    strip_fixture = [
        # (input, expected strip_accents(nfc_normalize(x)))
        ("कागज़", "कगज"),  # Mc+Mn
        ("a⃝b", "ab"),                                         # Me
        ("pén", "pen"),                                       # Mn
        ("İ", "I"),                       # dotted I: NFD -> I + Mn
    ]
    for x, want in strip_fixture:
        got = con.execute(
            "select strip_accents(nfc_normalize(?))", [x]).fetchone()[0]
        if got != want:
            print(f"FAIL strip_accents({x!r}): duckdb={got!r} want={want!r}")
            ok = False
    if ok:
        print("case differential OK: CodepointLower == DuckDB lower "
              "outside the pinned set; StripAccents == utf8proc STRIPMARK")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
