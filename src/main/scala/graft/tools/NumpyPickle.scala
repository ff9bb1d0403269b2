package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Emits the pickle byte stream `pickle.dumps(numpy_float32_array,
  * protocol=3)` produces — `numpy.core.multiarray._reconstruct` +
  * `__setstate__` with the little-endian '<f4' dtype — so artifacts
  * written here unpickle into real numpy arrays on any Python host
  * (validated against CPython+numpy in TorchExportSpec). Format
  * knowledge is the public pickle/numpy serialization protocol.
  */
object NumpyPickle {

  def float32(shape: Seq[Int], data: Array[Float]): Array[Byte] = {
    require(shape.product == data.length, s"shape $shape != ${data.length} values")
    val o = new ByteArrayOutputStream()
    def raw(bs: Int*): Unit = bs.foreach(o.write)
    def global(module: String, name: String): Unit = {
      o.write('c'); o.write(s"$module\n$name\n".getBytes("UTF-8"))
    }
    def int(v: Int): Unit = {
      o.write('J')
      o.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      o.write('X')
      o.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length).array())
      o.write(b)
    }
    def binbytes(b: Array[Byte]): Unit = {
      o.write('B')
      o.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length).array())
      o.write(b)
    }
    raw(0x80, 3) // PROTO 3
    global("numpy.core.multiarray", "_reconstruct")
    raw('(') // args
    global("numpy", "ndarray")
    raw('('); int(0); raw('t') // (0,)
    binbytes(Array('b'.toByte))
    raw('t', 'R') // _reconstruct(ndarray, (0,), b'b')
    // __setstate__((1, shape, dtype('<f4'), False, data))
    raw('(')
    int(1)
    raw('('); shape.foreach(int); raw('t')
    global("numpy", "dtype")
    raw('('); str("f4"); raw(0x89, 0x88, 't', 'R') // dtype('f4', False, True)
    raw('('); int(3); str("<"); raw('N', 'N', 'N'); int(-1); int(-1); int(0); raw('t', 'b')
    raw(0x89) // fortran_order = False
    val bb = ByteBuffer.allocate(4 * data.length).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putFloat)
    binbytes(bb.array())
    raw('t', 'b', '.') // BUILD, STOP
    o.toByteArray
  }
}
