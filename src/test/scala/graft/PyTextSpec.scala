package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PyText

/** PyText replicates Python str semantics exactly (SURVEY §2.6 F1-F4);
  * fixtures are the literal tables from the reference
  * (/root/reference/etl_completo.py:940-1002). Property tests use a seeded
  * generator (the scalatest+scalacheck bridge artifact is not in the
  * offline cache).
  */
class PyTextSpec extends AnyFunSuite {

  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ 09'-éÃ\t"
    (0 until n).map(_ => (0 until rnd.nextInt(20)).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  test("title matches Python str.title() on the tricky cases") {
    assert(PyText.title("o'neil-x2y") === "O'Neil-X2Y") // capitalize after ANY non-letter
    assert(PyText.title("hello world") === "Hello World")
    assert(PyText.title("SÃO paulo") === "São Paulo")
    assert(PyText.title("a1b2") === "A1B2")
    assert(PyText.title("") === "")
    assert(PyText.title(null) === null)
  }

  test("cleanText: falsy → N/A, whitespace collapse, title") {
    assert(PyText.cleanText(null) === "N/A")
    assert(PyText.cleanText("") === "N/A")
    assert(PyText.cleanText("  foo   BAR  ") === "Foo Bar")
    // whitespace-only is truthy in Python → becomes "" (not "N/A")
    assert(PyText.cleanText("   ") === "")
  }

  test("standardizeName lowers connectives except word 0") {
    assert(PyText.standardizeName("Maria Da Silva") === "Maria da Silva")
    assert(PyText.standardizeName("Da Silva") === "Da Silva") // word 0 stays
    assert(PyText.standardizeName("X Da De Y") === "X da de Y") // consecutive
    assert(PyText.standardizeName("Loja De") === "Loja de") // trailing
    assert(PyText.standardizeName("N/A") === "N/A")
    assert(PyText.standardizeName(null) === null)
  }

  test("standardizeRegion: map hit, title fallback, falsy default") {
    assert(PyText.standardizeRegion(" SÃO PAULO ") === "São Paulo")
    assert(PyText.standardizeRegion("bahia") === "Bahia")
    assert(PyText.standardizeRegion("") === "Não Definido")
    assert(PyText.standardizeRegion(null) === "Não Definido")
  }

  test("isCapital: exact case-sensitive pair match") {
    assert(PyText.isCapital("São Paulo", "SP"))
    assert(!PyText.isCapital("são paulo", "SP"))
    assert(!PyText.isCapital("São Paulo", "RJ"))
    assert(!PyText.isCapital(null, "SP"))
  }

  test("cleanText is idempotent (property)") {
    for (s <- randomStrings(500)) {
      val once = PyText.cleanText(s)
      assert(PyText.cleanText(once) === (if (once.isEmpty) "N/A" else once))
    }
  }

  test("title is length-preserving (property)") {
    for (s <- randomStrings(500)) {
      assert(PyText.title(s).length === s.length)
    }
  }
}
