package graft.filters

import org.scalatest.funsuite.AnyFunSuite

class CodeFiltersSpec extends AnyFunSuite {

  test("XmlHeader drops xml-declared files (code.py:123-144)") {
    assert(!CodeFilters.XmlHeader().keepDocument("<?xml version=\"1.0\"?><root/>"))
    assert(CodeFilters.XmlHeader().keepDocument("def f():\n    return 1"))
    // declaration beyond the 100-char prefix is ignored
    assert(CodeFilters.XmlHeader().keepDocument(("x" * 101) + "<?xml version="))
  }

  test("Alpha keeps alphabetic-enough sources (code.py:147-163)") {
    assert(CodeFilters.Alpha().keepDocument("def add(a, b): return a + b"))
    assert(!CodeFilters.Alpha().keepDocument("1 2 3 4 5 6 7 8 9 0 1 2 3 4"))
  }

  test("NumberOfLines bounds (code.py:86-97)") {
    val f = CodeFilters.NumberOfLines(minLines = 2, maxLines = 4)
    assert(f.score("a\nb\nc") == 3.0)
    assert(f.keepDocument("a\nb\nc"))
    assert(!f.keepDocument("single line"))
  }

  test("CommentToCode ratio with // and /* */ (code.py:50-83 semantics)") {
    val f = CodeFilters.CommentToCode()
    val commented = "int x = 1; // set x to one\n/* block\ncomment */\nint y = 2;"
    val s = f.score(commented)
    assert(s > 0.01 && s < 0.85, s.toString)
    assert(f.keepDocument(commented))
    assert(!f.keepDocument("int x=1;\nint y=2;\nint z=3;")) // no comments -> below min
    // comment markers inside strings don't count
    assert(f.score("s = \"// not a comment\";") == 0.0)
  }

  test("PythonCommentToCode counts # and docstrings (code.py:27-47 semantics)") {
    val f = CodeFilters.PythonCommentToCode()
    val src = "def f():\n    \"\"\"docstring here\"\"\"\n    # a comment\n    return 1\n"
    assert(f.keepDocument(src))
    assert(!f.keepDocument("def f():\n    return 1\n"))
  }

  test("HtmlBoilerplate keeps content-rich html (code.py:166-197 semantics)") {
    val content = "<html><body><p>" + ("real content with words " * 10) + "</p></body></html>"
    assert(CodeFilters.HtmlBoilerplate().keepDocument(content))
    val boiler = "<html><head><script>" + ("var x = 1;" * 200) + "</script></head><body><p>tiny</p></body></html>"
    assert(!CodeFilters.HtmlBoilerplate().keepDocument(boiler))
  }

  test("PerExtension dispatches by extension (code.py:200+ shape)") {
    val rules = Map[String, DocFilter](
      "py" -> CodeFilters.PythonCommentToCode(),
      "xml" -> CodeFilters.XmlHeader())
    assert(CodeFilters.PerExtension(rules, "py")
      .keepDocument("# top comment\nx = 1\n"))
    assert(!CodeFilters.PerExtension(rules, "xml")
      .keepDocument("<?xml version=\"1.0\"?>"))
  }
}
