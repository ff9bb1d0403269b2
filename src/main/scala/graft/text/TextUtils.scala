package graft.text

/** Document tokenization helpers, semantics-matched to the reference
  * (stages/text/utils/text_utils.py:62-86):
  *   - words      = Unicode-whitespace split (en path; zh/ja segmenters are
  *                  out of scope offline — reference default is the same
  *                  whitespace splitter, text_utils.py:62-67)
  *   - paragraphs = split("\n\n"), keeps empties (text_utils.py:70-74)
  *   - sentences  = non-blank lines (text_utils.py:77-81)
  *   - ngrams     = sliding windows over the word list (text_utils.py:84-86)
  */
object TextUtils {

  def words(text: String): Array[String] = PyText.splitWhitespace(text)

  def paragraphs(text: String): Array[String] = PyText.splitLiteral(text, "\n\n")

  def sentences(text: String): Array[String] =
    PyText.splitLiteral(text, "\n").filter(l => PyText.strip(l).nonEmpty)

  /** n-grams as joined-by-space strings (what the filters compare/count). */
  def ngrams(tokens: Array[String], n: Int): Array[Array[String]] = {
    if (tokens.length < n) return Array.empty
    Array.tabulate(tokens.length - n + 1)(i => java.util.Arrays.copyOfRange(tokens, i, i + n))
  }

  /** reference text_utils.py:88-109 — boilerplate paragraph indices are
    * contiguous and touch the top or bottom (but not the whole doc).
    */
  def indicesTopOrBottomOnly(indices: Array[Int], numParagraphs: Int): Boolean = {
    if (indices.length == numParagraphs) return false
    var i = 0
    while (i < indices.length - 1) {
      if (indices(i) + 1 != indices(i + 1)) return false
      i += 1
    }
    indices.head == 0 || indices.last == numParagraphs - 1
  }
}
