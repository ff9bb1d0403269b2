package graft.text

import org.scalatest.funsuite.AnyFunSuite

class PyFloatSpec extends AnyFunSuite {

  private val battery: Seq[Double] = Seq(
    0.0, -0.0, 5.0, -0.25, 0.1, 0.0005, 0.0001, 0.00005, 5e-05, 1.5e-05,
    2.5e-10, 1e16, 1.23e16, 9.999e15, 123456789012345.6, 1e23, 7e100,
    1e-100, 0.00098, 1e-6, 3.1415926535897932, 1234567.0, 12345678.9,
    0.6510683760683761, 64000.0 / 12800.0, 1.0 / 3.0)
  // (denormals like Double.MinPositiveValue are out of scope: Java 17's
  // legacy toString emits non-shortest digits there — "4.9E-324" vs
  // Python's "5e-324"; no pipeline field carries subnormals)

  test("CPython repr rules: positional in [-4,16), scientific outside") {
    assert(PyFloat.repr(0.0005) == "0.0005")
    assert(PyFloat.repr(0.00005) == "5e-05")
    assert(PyFloat.repr(1.5e-05) == "1.5e-05")
    assert(PyFloat.repr(1e16) == "1e+16")
    assert(PyFloat.repr(1.23e16) == "1.23e+16")
    assert(PyFloat.repr(9.999e15) == "9999000000000000.0")
    assert(PyFloat.repr(123456789012345.6) == "123456789012345.6")
    assert(PyFloat.repr(5.0) == "5.0")
    assert(PyFloat.repr(-0.25) == "-0.25")
    assert(PyFloat.repr(0.1) == "0.1")
    assert(PyFloat.repr(0.0001) == "0.0001")
    assert(PyFloat.repr(1e23) == "1e+23")
    assert(PyFloat.repr(7e100) == "7e+100")
    assert(PyFloat.repr(0.0) == "0.0" && PyFloat.repr(-0.0) == "-0.0")
    assert(PyFloat.repr(1.0 / 3.0) == "0.3333333333333333")
  }

  test("battery matches genuine CPython repr (env-gated on python3)") {
    val python = Seq("python3", "/usr/bin/python3").find { p =>
      try new ProcessBuilder(p, "-c", "1").start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    }
    assume(python.isDefined, "python3 not available")
    // ship each double as its exact bit pattern so no parse ambiguity
    val bits = battery.map(java.lang.Double.doubleToRawLongBits).mkString(",")
    val script =
      s"""
import struct
for b in [$bits]:
    print(repr(struct.unpack('<d', struct.pack('<q', b))[0]))
"""
    val dir = java.nio.file.Files.createTempDirectory("pyfloat").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/r.py"), script.getBytes("UTF-8"))
    val proc = new ProcessBuilder(python.get, s"$dir/r.py").redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"python failed: $out")
    val expected = out.trim.split("\n").toSeq
    val actual = battery.map(PyFloat.repr)
    expected.zip(actual).zip(battery).foreach { case ((e, a), v) =>
      assert(e == a, s"repr($v): python='$e' scala='$a'")
    }
  }
}
