#!/usr/bin/env python3
"""DuckDB half of the shared-tokenizer parity fixture.

Round9Spec ("tokenizer: punctuation, multi-script, and whitespace-fold
fixture") pins Spark's TextOps.tokens on these EXACT rows; this tool pins
DuckDB's regexp_split_to_array with the identical pattern on the same
rows. Both green together prove the two engines tokenize punctuated /
multi-script / extra-whitespace text identically — the contract every
text oracle in SparkEntry.oracleSql relies on.

Dev tool only — the shipped Scala library does not depend on this.
"""
import duckdb

# keep in lockstep with Round9Spec.TokenizerFixture
FIXTURE = [
    ("Hello, world! It's 2024-08.",
     ["hello", "world", "it", "s", "2024", "08"]),
    ("  multiple   spaces\tand\nnewlines  ",
     ["multiple", "spaces", "and", "newlines"]),
    ("Café naïve Zürich ÉLAN", ["café", "naïve", "zürich", "élan"]),
    ("日本語のテキストと English mixed",
     ["日本語のテキストと", "english", "mixed"]),
    ("Привет, мир! Ёлка", ["привет", "мир", "ёлка"]),
    ("!!! ... ---", []),
    ("foo_bar baz-qux", ["foo", "bar", "baz", "qux"]),
    ("a1b2 3c", ["a1b2", "3c"]),
    ("", []),
]

SQL = ("SELECT list_filter(regexp_split_to_array(lower(?), "
       "'[^\\p{L}\\p{N}]+'), t -> t <> '')")


def main():
    con = duckdb.connect()
    bad = 0
    for text, want in FIXTURE:
        got = con.execute(SQL, [text]).fetchone()[0]
        status = "OK  " if got == want else "FAIL"
        if got != want:
            bad += 1
            print(f"{status} {text!r}: got {got}, want {want}")
        else:
            print(f"{status} {text!r}")
    print(f"== {len(FIXTURE) - bad} OK, {bad} FAIL ==")
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
