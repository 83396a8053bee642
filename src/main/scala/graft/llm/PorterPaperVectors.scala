package graft.llm

/** Porter stemmer test vectors from the PUBLISHED algorithm (Porter
  * 1980, "An algorithm for suffix stripping" — the step examples printed
  * in the paper). Single source of truth for both StemmerSpec and the
  * driver-checked q_text_stem query: the engine stems the words, the
  * DuckDB oracle holds the paper's expected stems as literals.
  * Reference implementation being validated: src/Functions/stem.cpp. */
object PorterPaperVectors {
  val vectors: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti", "cats" -> "cat",
    // step 1b + cleanup
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "digitizer" -> "digit",
    "differentli" -> "differ", // step 2 gives 'different'; step 4 then strips 'ent'
    "vietnamization" -> "vietnam", "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal", "sensitiviti" -> "sensit",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "communism" -> "commun", "activate" -> "activ", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  /** The oracle-side rendering: a VALUES table of the paper's pairs. */
  def duckDbValues: String =
    vectors.map { case (w, st) => s"('$w', '$st')" }.mkString(", ")
}
