package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SparkEntry.mirrorEmbeddingsQuarantine]]'s table-reference
  * boundary detection — in particular the comma form's FROM-list
  * context gate (advice r13: a SELECT-list / GROUP-BY / function-arg
  * reference to a COLUMN named `embeddings` must never be rewritten
  * into a table subquery, which would corrupt the oracle SQL).
  */
class QuarantineMirrorSpec extends AnyFunSuite {

  private def mirrored(sql: String) = SparkEntry.mirrorEmbeddingsQuarantine(sql)
  private val Sub = "(SELECT * FROM embeddings WHERE"

  test("FROM / JOIN / FROM-list-comma reads are rewritten, alias kept") {
    assert(mirrored("SELECT vec_id FROM embeddings").contains(Sub))
    assert(mirrored("SELECT e.vec_id FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id")
      .contains(Sub + " ") || mirrored("JOIN embeddings e").contains(Sub))
    val aliased = mirrored("SELECT x FROM t, embeddings e WHERE t.id = e.vec_id")
    assert(aliased.contains(Sub) && aliased.contains(") e WHERE"), aliased)
    val asAlias = mirrored("SELECT x FROM embeddings AS em")
    assert(asAlias.contains(Sub) && asAlias.contains("AS em"), asAlias)
    // bare read keeps the table name as the subquery alias
    val bare = mirrored("SELECT count(*) FROM t, embeddings")
    assert(bare.contains(Sub) && bare.contains(") embeddings"), bare)
    // comma form continuing a FROM clause past a JOIN...ON still rewrites
    val afterOn = mirrored(
      "SELECT 1 FROM a JOIN b ON a.x = b.x, embeddings WHERE a.y = vec_id")
    assert(afterOn.contains(Sub), afterOn)
    // subquery-closing paren before the comma is still a table list
    val afterSub = mirrored("SELECT 1 FROM (SELECT 1 AS z) q, embeddings")
    assert(afterSub.contains(Sub), afterSub)
    // a BARE read immediately followed by another JOIN read: the JOIN
    // keyword must not be consumed as a candidate alias, or the second
    // reference goes unquarantined (r16 fuzzer finding — the alias
    // group's negative keyword lookahead pins this)
    val selfJoin = mirrored("SELECT 1 FROM embeddings JOIN embeddings ON a = b")
    assert("\\(SELECT \\* FROM embeddings WHERE".r
      .findAllIn(selfJoin).size === 2, selfJoin)
    assert(selfJoin.contains(") embeddings JOIN (") &&
      selfJoin.contains(") embeddings ON a = b"), selfJoin)
  }

  test("comma-preceded COLUMN references named embeddings pass through") {
    val cases = Seq(
      "SELECT a, embeddings FROM t",
      "SELECT a, embeddings AS e2 FROM t",
      "SELECT sum(x) FROM t GROUP BY a, embeddings",
      "SELECT x FROM t ORDER BY a, embeddings",
      "SELECT coalesce(a, embeddings) FROM t",
      "SELECT row_number() OVER (PARTITION BY a, embeddings ORDER BY b) FROM t",
      "SELECT CASE WHEN x THEN a ELSE b END, embeddings FROM t",
      "SELECT x FROM t WHERE y IN (a, embeddings)")
    cases.foreach { sql =>
      assert(mirrored(sql) === sql, s"must not rewrite column ref in: $sql")
    }
  }

  test("qualified columns / function calls / string literals never match") {
    val cases = Seq(
      "SELECT embeddings.vec_id FROM t",       // qualified: lookahead
      "SELECT embeddings(x) FROM t",           // call: lookahead
      "SELECT 'FROM embeddings in a literal, embeddings too' AS s FROM t")
    // the literal case: the comma inside the string precedes an
    // `embeddings` token; parity-aware backward scan must not treat
    // literal content as clause keywords. The FROM alternative inside
    // a literal DOES still regex-match (the regex is not
    // literal-aware), so assert only that the comma form is inert.
    assert(mirrored(cases(0)) === cases(0))
    assert(mirrored(cases(1)) === cases(1))
    assert(!mirrored(cases(2)).contains(", " + Sub), mirrored(cases(2)))
  }

  test("every comma-embeddings occurrence in the real oracles is a table read") {
    // the context gate SKIPS non-FROM-list commas; this asserts the
    // skip never silently drops a genuine embeddings table read in
    // the shipping oracle inventory (the failure mode the gate's
    // conservatism could hide)
    val ref = """(?is)(,\s*)embeddings\b(?![.(])""".r
    for ((name, sql) <- SparkEntry.rawOracles;
         m <- ref.findAllMatchIn(sql)) {
      assert(SparkEntry.inFromTableList(sql, m.start),
        s"oracle $name has a comma-preceded embeddings outside a FROM list " +
          s"at char ${m.start} — if it is a column, rename it; if a table " +
          "read, the context gate just missed it")
    }
    // and the mirror itself must have rewritten every FROM/JOIN read:
    // after mirroring, any remaining `FROM embeddings` token is the
    // quarantine subquery's own (always followed by WHERE)
    val raw = """(?is)\b(FROM|JOIN)\s+embeddings\b(?![.(])(?!\s+WHERE\b)""".r
    for ((name, sql) <- SparkEntry.oracleSql; m <- raw.findAllMatchIn(sql))
      fail(s"oracle $name kept an unquarantined embeddings read: " +
        sql.substring(m.start, math.min(sql.length, m.start + 60)))
  }
}
