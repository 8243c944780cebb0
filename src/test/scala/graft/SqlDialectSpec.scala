package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the DuckDB→Spark dialect rewriter — each test is one
  * of the trap classes the round-17 surface extension hit, kept as a
  * regression wall so a rewrite reorder or regex tweak cannot silently
  * re-open them (the end-to-end net is SqlParitySpec; these localize
  * the failure).
  */
class SqlDialectSpec extends AnyFunSuite {
  private def d(s: String) = SqlSurface.dialect(s)

  test("backslashes in string literals double (Spark C-escapes, DuckDB reads raw)") {
    assert(d("""split(x, '\s+')""") === """split(x, '\\s+')""")
  }

  test("replacement backrefs become $N, embedded or standalone") {
    assert(d("""regexp_replace(t, '([a-z]+)', 'tq\1', 'g')""") ===
      """regexp_replace(t, '([a-z]+)', 'tq$1')""")
    assert(d("""regexp_replace(t, '(a)(b)', '\2\1', 'g')""") ===
      """regexp_replace(t, '(a)(b)', '$2$1')""")
  }

  test("1-based indexing and slices rewrite; 0-based bare subscripts never survive") {
    assert(d("cs[i]") === "element_at(cs, i)")
    assert(d("ts[i : i + 2]") === "slice(ts, i, (i + 2) - (i) + 1)")
    assert(d("ts[i:i+2]") === "slice(ts, i, (i+2) - (i) + 1)")
    assert(d("ts[2 :]") === "slice(ts, 2, size(ts))")
  }

  test("list literals convert even when elements are quoted strings (regex cannot span literals)") {
    assert(d("x IN ['a', 'b', 'c']") === "x IN array('a', 'b', 'c')")
    // a character class inside a string literal is NOT a list
    assert(d("regexp_extract(u, '[?&]x', 0)") ===
      "regexp_extract(u, '[?&]x', 0)")
  }

  test("2-arg regexp_extract_all pins group 0, and charset-inserting rewrites run after it") {
    assert(d("len(regexp_extract_all(t, '..'))") ===
      "size(regexp_extract_all(t, '..', 0))")
    // encode(w) gains 'UTF-8' and the pin must NOT mistake that
    // charset literal for its pattern argument
    assert(d("regexp_extract_all(hex(encode(w)), '..')") ===
      "regexp_extract_all(hex(encode(w, 'UTF-8')), '..', 0)")
  }

  test("decimal literals pin DOUBLE, big multipliers pin BIGINT, spaced // becomes div") {
    assert(d("avg(CASE WHEN x THEN 1.0 ELSE 0.0 END)") ===
      "avg(CASE WHEN x THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)")
    assert(d("percentile(n, [0.25D])") === "percentile(n, array(0.25D))")
    assert(d("(i - 1) * 268435456") === "(i - 1) * CAST(268435456 AS BIGINT)")
    assert(d("x * 281474976710656.0") ===
      "x * CAST(281474976710656.0 AS DOUBLE)")
    assert(d("a // 7") === "a div 7")
    assert(d("'http://x'") === "'http://x'")
  }

  test("FROM-position unnest becomes a LATERAL VIEW, same line or wrapped") {
    assert(d("FROM tok, unnest(generate_series(1, 3)) AS t(i)") ===
      "FROM tok LATERAL VIEW explode(sequence(1, 3)) t AS i")
    assert(d("FROM tot,\n  unnest(generate_series(0, n, 4)) AS u(st)") ===
      "FROM tot\n  LATERAL VIEW explode(sequence(0, n, 4)) u AS st")
  }

  test("trailing QUALIFY wraps the LAST select, leaving CTE heads intact") {
    val in = "WITH q AS (SELECT 1 AS a)\nSELECT a,\n  row_number() OVER (ORDER BY a) AS rank\nFROM q QUALIFY rank <= 5 ORDER BY a"
    val out = d(in)
    assert(out.startsWith("WITH q AS (SELECT 1 AS a)\nSELECT * FROM ("), out)
    assert(out.endsWith(") WHERE rank <= 5 ORDER BY a"), out)
  }

  test("MATERIALIZED hints drop; epoch_ns, VARCHAR, HUGEINT, list functions rename") {
    assert(d("WITH t AS MATERIALIZED (SELECT 1)") === "WITH t AS (SELECT 1)")
    assert(d("epoch_ns(ts)") ===
      "(unix_micros(CAST(ts AS TIMESTAMP)) * 1000)")
    assert(d("CAST(NULL AS VARCHAR)") === "CAST(NULL AS STRING)")
    assert(d("CAST(s AS HUGEINT)") === "CAST(s AS DECIMAL(38,0))")
    assert(d("list_filter(xs, x -> x <> '')") ===
      "filter(xs, x -> x <> '')")
    assert(d("string_split_regex(t, 'a')") === "split(t, 'a')")
  }

  test("'g' flag drops ONLY from regexp_replace, however nested; other functions keep a literal 'g'") {
    assert(d("regexp_replace(t, 'a+', 'b', 'g')") ===
      "regexp_replace(t, 'a+', 'b')")
    // nested calls: every level's flag drops, nothing else moves
    assert(d("regexp_replace(regexp_replace(t, 'a', 'x', 'g'), 'b', 'y', 'g')") ===
      "regexp_replace(regexp_replace(t, 'a', 'x'), 'b', 'y')")
    // a literal 'g' as the final argument of ANOTHER function survives
    // (the old whole-text replace deleted it)
    assert(d("split(x, 'g')") === "split(x, 'g')")
    assert(d("instr(regexp_replace(t, 'a', 'b', 'g'), 'g')") ===
      "instr(regexp_replace(t, 'a', 'b'), 'g')")
    // a ", 'g')" SEQUENCE inside a pattern literal survives too
    assert(d("regexp_replace(t, 'x, ''g''', 'y', 'g')") ===
      "regexp_replace(t, 'x, ''g''', 'y')")
  }

  test("nested subscripts rewrite to a fixpoint — no 0-based bare bracket survives") {
    assert(d("a[b[i]]") === "element_at(a, element_at(b, i))")
    assert(d("m[idx[1]] + n[2]") ===
      "element_at(m, element_at(idx, 1)) + element_at(n, 2)")
  }

  test("inexpressible keys fail fast with the registry's reason") {
    SqlSurface.inexpressible.foreach { case (k, reason) =>
      val e = intercept[IllegalArgumentException] { SqlSurface.statement(k) }
      assert(e.getMessage.contains(k))
      assert(e.getMessage.contains(reason.take(30)), s"reason surfaced for $k")
    }
  }

  test("statement() covers exactly surface ∪ inexpressible and throws outside it") {
    (SqlSurface.declaredKeys ++ SqlSurface.extendedKeys).foreach { k =>
      assert(SqlSurface.statement(k).nonEmpty, k)
    }
    intercept[IllegalArgumentException] {
      SqlSurface.statement("not_a_key")
    }
  }
}
