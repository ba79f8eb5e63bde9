package graft.cli

import java.io.{BufferedReader, PrintStream, StringReader}
import org.scalatest.funsuite.AnyFunSuite

/** Lexer correctness of the console's statement splitter: semicolons and
  * quotes inside comments / quoted identifiers must not split or hold
  * the buffer open (r9 advice catch — the single-quote-only tracker let
  * a quote inside `-- don't` flip the string state and a `;` inside
  * "a;b" split the statement). */
class SqlConsoleSplitSpec extends AnyFunSuite {
  private val console = new SqlConsole(
    new BufferedReader(new StringReader("")),
    new PrintStream(java.io.OutputStream.nullOutputStream()),
    _ => (200, """{"status":"success","data":[]}"""))

  test("single-quoted literals keep ; and '' escapes intact") {
    assert(console.statementsOf("SELECT 'a;b'; SELECT 'it''s; fine';") ==
      Seq("SELECT 'a;b'", "SELECT 'it''s; fine'"))
    assert(console.inOpenString("SELECT 'unclosed"))
    assert(!console.inOpenString("SELECT 'closed'"))
  }

  test("double-quoted, backtick and bracket identifiers are non-splittable") {
    assert(console.statementsOf("""SELECT "a;b" FROM t; SELECT 1;""") ==
      Seq("""SELECT "a;b" FROM t""", "SELECT 1"))
    assert(console.statementsOf("SELECT `x;y` FROM t;") ==
      Seq("SELECT `x;y` FROM t"))
    assert(console.statementsOf("SELECT [c;d] FROM t;") ==
      Seq("SELECT [c;d] FROM t"))
    assert(console.statementsOf("""SELECT "he""llo;" FROM t;""") ==
      Seq("""SELECT "he""llo;" FROM t"""))
    assert(console.inOpenString("""SELECT "open"""))
    assert(console.inOpenString("SELECT [open"))
  }

  test("quotes inside comments do not flip the string state") {
    // the advice's exact case: a line comment containing an apostrophe
    assert(console.statementsOf("SELECT 1; -- don't\nSELECT 2;") ==
      Seq("SELECT 1", "-- don't\nSELECT 2"))
    assert(!console.inOpenString("SELECT 1; -- don't\n"))
    assert(console.statementsOf("SELECT /* no; split ' here */ 3;") ==
      Seq("SELECT /* no; split ' here */ 3"))
    // an unterminated block comment holds the buffer open; a line
    // comment closes at the newline the console appends per line
    assert(console.inOpenString("SELECT /* still open ';'"))
    assert(!console.inOpenString("SELECT 1 -- trailing'\n"))
  }
}
