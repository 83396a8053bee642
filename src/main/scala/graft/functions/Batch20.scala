package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 20: string-search tail kernels.
  *
  *  - approximate substring distance (Sellers 1980 dynamic program) for
  *    the multiFuzzyMatch* family (reference
  *    src/Functions/MultiMatchAnyImpl.h — hyperscan edit-distance there;
  *    LITERAL patterns only here, regex metacharacters rejected loudly)
  *  - compareSubstrings (src/Functions/compareSubstrings.cpp: zero-based
  *    offsets, memcmp over num_bytes clipped to the available bytes)
  *  - bitSlice (src/Functions/bitSlice.cpp: 1-based bit offset, negative
  *    offset/length from the end, trailing partial byte zero-padded)
  *  - bin/unbin (src/Functions/FunctionsBinaryRepr.cpp: integers render
  *    at their type's full bit width, strings per-byte; unbin pads the
  *    leading partial group)
  *  - decodeHTMLComponent (src/Functions/decodeHTMLComponent.cpp:
  *    numeric entities to UTF-8 exactly; named entities via a curated
  *    subset of the HTML5 table — unknown entities pass through)
  *  - stringJaccardIndexUTF8 (src/Functions/stringJaccardIndex.cpp
  *    is_utf8 branch: code-point set Jaccard)
  */
object Batch20 {

  // ---- Sellers approximate substring matching ----
  private val regexMeta = ".[]{}()\\*+?|^$".toSet

  /** Minimal edit distance between `needle` and any substring of
    * `haystack` (free start and end in the haystack). O(n*m) dp. */
  def substrEditDistance(haystack: Array[Byte], needle: Array[Byte]): Int = {
    val m = needle.length
    if (m == 0) return 0
    // column dp over the haystack; D(0) = 0 for every text position
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var best = prev(m)
    var i = 0
    while (i < haystack.length) {
      cur(0) = 0
      j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (haystack(i) == needle(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      if (cur(m) < best) best = cur(m)
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    best
  }

  def requireLiteral(pattern: String): Unit = {
    val bad = pattern.find(regexMeta.contains)
    if (bad.isDefined) throw new IllegalArgumentException(
      s"multiFuzzyMatch*: only literal patterns are supported here " +
        s"(regex metacharacter '${bad.get}' in '$pattern')")
  }

  // ---- compareSubstrings ----
  def compareSubstrings(s1: Array[Byte], s2: Array[Byte],
                        off1: Int, off2: Int, n: Int): Byte = {
    var i = 0
    while (i < n) {
      val a1 = off1 + i < s1.length
      val a2 = off2 + i < s2.length
      if (!a1 && !a2) return 0
      if (!a1) return -1
      if (!a2) return 1
      val c = (s1(off1 + i) & 0xFF) - (s2(off2 + i) & 0xFF)
      if (c < 0) return -1
      if (c > 0) return 1
      i += 1
    }
    0
  }

  // ---- bitSlice ----
  /** 1-based bit offset; negative offset counts from the end; negative
    * length leaves |length| bits off the end. Result bits are
    * left-aligned, trailing partial byte zero-padded. */
  def bitSlice(src: Array[Byte], offset1: Long, lengthOpt: Option[Long]): Array[Byte] = {
    val totalBits = src.length.toLong * 8
    var start = if (offset1 > 0) offset1 - 1
      else if (offset1 < 0) totalBits + offset1
      else 0L
    if (start < 0) start = 0
    if (start > totalBits) start = totalBits
    val end = lengthOpt match {
      case None => totalBits
      case Some(len) if len >= 0 => math.min(start + len, totalBits)
      case Some(len) => math.max(start, totalBits + len) // drop |len| bits at the end
    }
    val nBits = math.max(0L, end - start).toInt
    val out = new Array[Byte]((nBits + 7) / 8)
    var b = 0
    while (b < nBits) {
      val srcPos = start + b
      val bit = (src((srcPos / 8).toInt) >> (7 - (srcPos % 8).toInt)) & 1
      if (bit != 0) out(b / 8) = (out(b / 8) | (1 << (7 - b % 8))).toByte
      b += 1
    }
    out
  }

  // ---- bin / unbin ----
  def binOfBytes(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 8)
    var i = 0
    while (i < bytes.length) {
      var bit = 7
      while (bit >= 0) { sb.append((bytes(i) >> bit) & 1); bit -= 1 }
      i += 1
    }
    sb.toString
  }

  /** Integer at its type's full bit width (reference renders the
    * little-endian bytes of the value most-significant-bit first per
    * byte, which for an integer equals the plain binary at type width
    * after its hex-style byte ordering; CH prints most significant byte
    * first with leading zero bytes SKIPPED for integers — mirrored). */
  def binOfLong(v: Long, byteWidth: Int): String = {
    // CH skips leading all-zero BYTES (like hex()), keeps full bytes
    var w = byteWidth
    while (w > 1 && ((v >>> ((w - 1) * 8)) & 0xFF) == 0) w -= 1
    val sb = new java.lang.StringBuilder(w * 8)
    var byteIdx = w - 1
    while (byteIdx >= 0) {
      val b = ((v >>> (byteIdx * 8)) & 0xFF).toInt
      var bit = 7
      while (bit >= 0) { sb.append((b >> bit) & 1); bit -= 1 }
      byteIdx -= 1
    }
    sb.toString
  }

  def unbin(s: String): Array[Byte] = {
    val clean = s
    val n = clean.length
    if (n == 0) return Array.emptyByteArray
    val outLen = (n + 7) / 8
    val out = new Array[Byte](outLen)
    // pad the FIRST group on the left (unbin('0110') = 0x06)
    var i = n - 1
    var bitPos = 0
    while (i >= 0) {
      val c = clean.charAt(i)
      val bit = if (c == '1') 1 else if (c == '0') 0
        else throw new IllegalArgumentException(s"unbin: invalid character '$c'")
      if (bit != 0) {
        val byteFromRight = bitPos / 8
        out(outLen - 1 - byteFromRight) =
          (out(outLen - 1 - byteFromRight) | (1 << (bitPos % 8))).toByte
      }
      bitPos += 1
      i -= 1
    }
    out
  }

  // ---- decodeHTMLComponent ----
  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢",
    "pound" -> "£", "curren" -> "¤", "yen" -> "¥",
    "brvbar" -> "¦", "sect" -> "§", "uml" -> "¨",
    "copy" -> "©", "ordf" -> "ª", "laquo" -> "«",
    "not" -> "¬", "shy" -> "­", "reg" -> "®",
    "macr" -> "¯", "deg" -> "°", "plusmn" -> "±",
    "sup2" -> "²", "sup3" -> "³", "acute" -> "´",
    "micro" -> "µ", "para" -> "¶", "middot" -> "·",
    "cedil" -> "¸", "sup1" -> "¹", "ordm" -> "º",
    "raquo" -> "»", "frac14" -> "¼", "frac12" -> "½",
    "frac34" -> "¾", "iquest" -> "¿", "times" -> "×",
    "divide" -> "÷", "szlig" -> "ß", "aelig" -> "æ",
    "AElig" -> "Æ", "oslash" -> "ø", "Oslash" -> "Ø",
    "euro" -> "€", "trade" -> "™", "hellip" -> "…",
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘",
    "rsquo" -> "’", "sbquo" -> "‚", "ldquo" -> "“",
    "rdquo" -> "”", "bdquo" -> "„", "dagger" -> "†",
    "Dagger" -> "‡", "bull" -> "•", "prime" -> "′",
    "Prime" -> "″", "lsaquo" -> "‹", "rsaquo" -> "›",
    "oline" -> "‾", "frasl" -> "⁄", "permil" -> "‰",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
    "darr" -> "↓", "harr" -> "↔", "minus" -> "−",
    "lowast" -> "∗", "radic" -> "√", "prop" -> "∝",
    "infin" -> "∞", "ang" -> "∠", "and" -> "∧",
    "or" -> "∨", "cap" -> "∩", "cup" -> "∪",
    "int" -> "∫", "there4" -> "∴", "sim" -> "∼",
    "cong" -> "≅", "asymp" -> "≈", "ne" -> "≠",
    "equiv" -> "≡", "le" -> "≤", "ge" -> "≥",
    "sub" -> "⊂", "sup" -> "⊃", "nsub" -> "⊄",
    "sube" -> "⊆", "supe" -> "⊇", "oplus" -> "⊕",
    "otimes" -> "⊗", "perp" -> "⊥", "sdot" -> "⋅",
    "forall" -> "∀", "part" -> "∂", "exist" -> "∃",
    "empty" -> "∅", "nabla" -> "∇", "isin" -> "∈",
    "notin" -> "∉", "ni" -> "∋", "prod" -> "∏",
    "sum" -> "∑", "alpha" -> "α", "beta" -> "β",
    "gamma" -> "γ", "delta" -> "δ", "epsilon" -> "ε",
    "zeta" -> "ζ", "eta" -> "η", "theta" -> "θ",
    "iota" -> "ι", "kappa" -> "κ", "lambda" -> "λ",
    "mu" -> "μ", "nu" -> "ν", "xi" -> "ξ",
    "omicron" -> "ο", "pi" -> "π", "rho" -> "ρ",
    "sigmaf" -> "ς", "sigma" -> "σ", "tau" -> "τ",
    "upsilon" -> "υ", "phi" -> "φ", "chi" -> "χ",
    "psi" -> "ψ", "omega" -> "ω", "Alpha" -> "Α",
    "Beta" -> "Β", "Gamma" -> "Γ", "Delta" -> "Δ",
    "Epsilon" -> "Ε", "Zeta" -> "Ζ", "Eta" -> "Η",
    "Theta" -> "Θ", "Iota" -> "Ι", "Kappa" -> "Κ",
    "Lambda" -> "Λ", "Mu" -> "Μ", "Nu" -> "Ν",
    "Xi" -> "Ξ", "Omicron" -> "Ο", "Pi" -> "Π",
    "Rho" -> "Ρ", "Sigma" -> "Σ", "Tau" -> "Τ",
    "Upsilon" -> "Υ", "Phi" -> "Φ", "Chi" -> "Χ",
    "Psi" -> "Ψ", "Omega" -> "Ω", "ensp" -> " ",
    "emsp" -> " ", "thinsp" -> " ", "zwnj" -> "‌",
    "zwj" -> "‍", "lrm" -> "‎", "rlm" -> "‏",
    "circ" -> "ˆ", "tilde" -> "˜", "loz" -> "◊",
    "spades" -> "♠", "clubs" -> "♣", "hearts" -> "♥",
    "diams" -> "♦", "lceil" -> "⌈", "rceil" -> "⌉",
    "lfloor" -> "⌊", "rfloor" -> "⌋", "lang" -> "⟨",
    "rang" -> "⟩"
  )

  def decodeHtmlComponent(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0) {
          // no terminating ';' in the rest: copy as-is (reference
          // copies the remainder once no entity end is found)
          sb.append(s, i, s.length)
          i = s.length
        } else {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              val hx = body.substring(2)
              if (hx.nonEmpty && hx.length <= 6 &&
                hx.forall(ch => Character.digit(ch, 16) >= 0)) {
                val cp = java.lang.Integer.parseInt(hx, 16)
                if (cp >= 0 && cp <= 0x10FFFF) Some(new String(Character.toChars(cp))) else None
              } else None
            } else if (body.startsWith("#")) {
              val dec = body.substring(1)
              if (dec.nonEmpty && dec.length <= 7 && dec.forall(_.isDigit)) {
                val cp = dec.toLong
                if (cp <= 0x10FFFF) Some(new String(Character.toChars(cp.toInt))) else None
              } else None
            } else namedEntities.get(body)
          decoded match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1 // copy the '&', rescan after it
          }
        }
      }
    }
    sb.toString
  }

  // ---- code-point set Jaccard ----
  def jaccardChars(a: String, b: String): Double = {
    val sa = a.codePoints().toArray.toSet
    val sb = b.codePoints().toArray.toSet
    if (sa.isEmpty && sb.isEmpty) return 0.0
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }
}

/** Min edit distance from `needle` (literal) to any substring of `hay`. */
case class SubstrEditDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(hay: Any, needle: Any): Any = {
    val n = needle.asInstanceOf[UTF8String].toString
    Batch20.requireLiteral(n)
    Batch20.substrEditDistance(
      hay.asInstanceOf[UTF8String].getBytes, n.getBytes("UTF-8"))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SubstrEditDistance =
    copy(left = l, right = r)
}

case class ChCompareSubstrings(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    Batch20.compareSubstrings(
      vs(0).asInstanceOf[UTF8String].getBytes,
      vs(1).asInstanceOf[UTF8String].getBytes,
      vs(2).asInstanceOf[Number].intValue,
      vs(3).asInstanceOf[Number].intValue,
      vs(4).asInstanceOf[Number].intValue).toInt
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ChCompareSubstrings =
    copy(children = c)
}

case class BitSliceExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val bytes = vs(0) match {
      case u: UTF8String => u.getBytes
      case b: Array[Byte] => b
    }
    val len = if (vs.length >= 3) Some(vs(2).asInstanceOf[Number].longValue) else None
    UTF8String.fromBytes(
      Batch20.bitSlice(bytes, vs(1).asInstanceOf[Number].longValue, len))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitSliceExpr =
    copy(children = c)
}

/** bin(): strings per byte; integers at their own width with leading
  * zero BYTES trimmed (reference FunctionsBinaryRepr.cpp). */
case class ChBin(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val s = child.dataType match {
      case StringType => Batch20.binOfBytes(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => Batch20.binOfBytes(v.asInstanceOf[Array[Byte]])
      case ByteType => Batch20.binOfLong(v.asInstanceOf[Byte].toLong & 0xFFL, 1)
      case ShortType => Batch20.binOfLong(v.asInstanceOf[Short].toLong & 0xFFFFL, 2)
      case IntegerType => Batch20.binOfLong(v.asInstanceOf[Int].toLong & 0xFFFFFFFFL, 4)
      case LongType => Batch20.binOfLong(v.asInstanceOf[Long], 8)
      // floats encode their LITTLE-ENDIAN memory bytes, full width, no
      // trimming (reference FunctionsBinaryRepr.cpp / hex() docs)
      case FloatType =>
        val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
        Batch20.binOfBytes(Array.tabulate(4)(i => ((bits >> (8 * i)) & 0xFF).toByte))
      case DoubleType =>
        val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        Batch20.binOfBytes(Array.tabulate(8)(i => ((bits >> (8 * i)) & 0xFF).toByte))
      case other => throw new IllegalArgumentException(s"bin: unsupported type $other")
    }
    UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): ChBin = copy(child = c)
}

case class ChUnbin(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(Batch20.unbin(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): ChUnbin = copy(child = c)
}

case class DecodeHtmlComponent(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Batch20.decodeHtmlComponent(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): DecodeHtmlComponent =
    copy(child = c)
}

case class JaccardCharsUTF8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    Batch20.jaccardChars(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardCharsUTF8 =
    copy(left = l, right = r)
}
