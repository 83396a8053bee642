package graft.plans

import graft.functions.{Codecs, IdGen, Stemmer, VectorKernels}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL registration of the engine's custom kernels, so the dialect layer
  * (and plain spark.sql) can call them by name (reference analog:
  * src/Functions/registerFunctions.cpp — every C++ function registers
  * into the shared factory; here SparkSessionExtensions.injectFunction
  * plays that role). */
object GraftFunctions {

  private def info(name: String) =
    new ExpressionInfo(getClass.getName.stripSuffix("$"), name)

  private def asLong(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.LongType)

  private def asDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // scale literals may arrive as UnaryMinus(Literal) for negative values
  private def scaleLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.UnaryMinus(inner, _) =>
      -scaleLit(inner, what)
    case Literal(i: Int, IntegerType) => i
    case Literal(l: Long, org.apache.spark.sql.types.LongType) => l.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def chRound(es: Seq[Expression], mode: Int, bankers: Boolean): Expression =
    graft.functions.ChRoundDispatch(es.head,
      if (es.length > 1) scaleLit(es(1), "rounding scale") else 0, mode, bankers)

  /** Catalyst-level dictionary lookup with identity/default fallback:
    * coalesce(element_at(mapLit, lower(x)), orElse(lower(x))). Built from
    * raw Catalyst nodes — a Column built via the public functions API
    * stays a ColumnNodeExpression (unevaluable) inside a FunctionBuilder,
    * so the composite must be assembled at the Expression layer here. */
  private def dictLookup(mapLit: Expression, word: Expression,
                         orElse: Expression => Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Coalesce, ElementAt, Lower}
    val lw = Lower(word)
    Coalesce(Seq(ElementAt(mapLit, lw), orElse(lw)))
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ipv6_string_to_num"), info("ipv6_string_to_num"),
      (es: Seq[Expression]) => Codecs.Ipv6StringToNum(es.head)),
    (FunctionIdentifier("ipv6_num_to_string"), info("ipv6_num_to_string"),
      (es: Seq[Expression]) => Codecs.Ipv6NumToString(es.head)),
    (FunctionIdentifier("geohash_encode"), info("geohash_encode"),
      (es: Seq[Expression]) =>
        Codecs.GeohashEncode(es(0), es(1),
          if (es.length > 2) intLit(es(2), "geohash precision") else 12)),
    (FunctionIdentifier("geohash_decode"), info("geohash_decode"),
      (es: Seq[Expression]) => Codecs.GeohashDecode(es.head)),
    (FunctionIdentifier("generate_uuid_v7"), info("generate_uuid_v7"),
      (_: Seq[Expression]) => IdGen.UuidV7()),
    (FunctionIdentifier("generate_snowflake_id"), info("generate_snowflake_id"),
      (_: Seq[Expression]) => IdGen.SnowflakeId()),
    (FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (es: Seq[Expression]) => VectorKernels.CosineSim(es(0), es(1))),
    (FunctionIdentifier("dot_product"), info("dot_product"),
      (es: Seq[Expression]) => VectorKernels.DotProduct(es(0), es(1))),
    (FunctionIdentifier("jaccard_sim"), info("jaccard_sim"),
      (es: Seq[Expression]) => VectorKernels.JaccardSim(es(0), es(1))),
    (FunctionIdentifier("char_ngram_hashes"), info("char_ngram_hashes"),
      (es: Seq[Expression]) =>
        VectorKernels.CharNgramHashes(es(0), intLit(es(1), "ngram size"))),
    (FunctionIdentifier("intersect_count_sorted_longs"), info("intersect_count_sorted_longs"),
      (es: Seq[Expression]) => VectorKernels.IntersectCountSortedLongs(es(0), es(1))),
    (FunctionIdentifier("porter_stem"), info("porter_stem"),
      (es: Seq[Expression]) => Stemmer.PorterStem(es.head)),
    // CH toDate over any input type (integrals = days since epoch)
    (FunctionIdentifier("ch_to_date"), info("ch_to_date"),
      (es: Seq[Expression]) => graft.functions.ChToDate(es.head)),
    // CH toTypeName: ClickHouse-spelled type of the argument
    (FunctionIdentifier("ch_type_name"), info("ch_type_name"),
      (es: Seq[Expression]) => graft.functions.ChTypeNameOf(es.head)),
    // positional tuple element (reference tupleElement by index — CH
    // tuples are positional; Spark SQL has no ordinal struct accessor, so
    // this builds GetStructField directly)
    (FunctionIdentifier("tuple_element_at"), info("tuple_element_at"),
      (es: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions.GetStructField(
        es.head, intLit(es(1), "tuple element index") - 1, None)),
    // formatQuery family (reference src/Functions/formatQuery.cpp:184-205)
    (FunctionIdentifier("format_query"), info("format_query"),
      (es: Seq[Expression]) => graft.functions.QueryFormat.FormatQueryExpr(es.head, singleLine = false, orNull = false)),
    (FunctionIdentifier("format_query_or_null"), info("format_query_or_null"),
      (es: Seq[Expression]) => graft.functions.QueryFormat.FormatQueryExpr(es.head, singleLine = false, orNull = true)),
    (FunctionIdentifier("format_query_single_line"), info("format_query_single_line"),
      (es: Seq[Expression]) => graft.functions.QueryFormat.FormatQueryExpr(es.head, singleLine = true, orNull = false)),
    (FunctionIdentifier("format_query_single_line_or_null"), info("format_query_single_line_or_null"),
      (es: Seq[Expression]) => graft.functions.QueryFormat.FormatQueryExpr(es.head, singleLine = true, orNull = true)),
    (FunctionIdentifier("ch_length"), info("ch_length"),
      (es: Seq[Expression]) => graft.functions.ChLength(es.head)),
    (FunctionIdentifier("ch_plus"), info("ch_plus"),
      (es: Seq[Expression]) => graft.functions.ChArith(es(0), es(1), graft.functions.ChArith.PLUS)),
    (FunctionIdentifier("ch_minus"), info("ch_minus"),
      (es: Seq[Expression]) => graft.functions.ChArith(es(0), es(1), graft.functions.ChArith.MINUS)),
    (FunctionIdentifier("ch_multiply"), info("ch_multiply"),
      (es: Seq[Expression]) => graft.functions.ChArith(es(0), es(1), graft.functions.ChArith.MULTIPLY)),
    (FunctionIdentifier("ch_abs"), info("ch_abs"),
      (es: Seq[Expression]) => graft.functions.ChAbs(es.head)),
    (FunctionIdentifier("ch_negate"), info("ch_negate"),
      (es: Seq[Expression]) => graft.functions.ChNegate(es.head)),
    (FunctionIdentifier("ch_round"), info("ch_round"),
      (es: Seq[Expression]) => chRound(es, graft.functions.ChRoundUtil.ROUND, bankers = false)),
    (FunctionIdentifier("ch_round_bankers"), info("ch_round_bankers"),
      (es: Seq[Expression]) => chRound(es, graft.functions.ChRoundUtil.ROUND, bankers = true)),
    (FunctionIdentifier("ch_floor"), info("ch_floor"),
      (es: Seq[Expression]) => chRound(es, graft.functions.ChRoundUtil.FLOOR, bankers = false)),
    (FunctionIdentifier("ch_ceil"), info("ch_ceil"),
      (es: Seq[Expression]) => chRound(es, graft.functions.ChRoundUtil.CEIL, bankers = false)),
    (FunctionIdentifier("ch_trunc"), info("ch_trunc"),
      (es: Seq[Expression]) => chRound(es, graft.functions.ChRoundUtil.TRUNC, bankers = false)),
    (FunctionIdentifier("ch_reverse"), info("ch_reverse"),
      (es: Seq[Expression]) => graft.functions.ChReverse(es.head)),
    (FunctionIdentifier("ch_element_at"), info("ch_element_at"),
      (es: Seq[Expression]) => graft.functions.ChElementAt(es(0), es(1))),
    (FunctionIdentifier("ch_sparkbar"), info("ch_sparkbar"),
      (es: Seq[Expression]) =>
        graft.functions.ChSparkbar(intLit(es(0), "sparkbar width"),
          es(1) match {
            case Literal(l: Long, LongType) => l
            case Literal(i: Int, IntegerType) => i.toLong
            case other => throw new IllegalArgumentException(
              s"sparkbar y-bound must be an integer literal, got $other")
          }, es.drop(2))),
    (FunctionIdentifier("ch_json_norm"), info("ch_json_norm"),
      (es: Seq[Expression]) => graft.functions.ChJsonNorm(es.head)),
    (FunctionIdentifier("ch_first_default"), info("ch_first_default"),
      (es: Seq[Expression]) => graft.functions.ChFirstLastDefault(es.head, last = false)),
    (FunctionIdentifier("ch_last_default"), info("ch_last_default"),
      (es: Seq[Expression]) => graft.functions.ChFirstLastDefault(es.head, last = true)),
    (FunctionIdentifier("geohash_kring"), info("geohash_kring"),
      (es: Seq[Expression]) =>
        graft.functions.GeoCells.GeohashKRing(es(0), intLit(es(1), "kRing k"))),
    (FunctionIdentifier("geohashes_in_box"), info("geohashes_in_box"),
      (es: Seq[Expression]) =>
        graft.functions.GeoCells.GeohashesInBox(es.slice(0, 4),
          intLit(es(4), "geohashesInBox precision"))),
    (FunctionIdentifier("gcd"), info("gcd"),
      (es: Seq[Expression]) => graft.functions.Gcd(asLong(es(0)), asLong(es(1)))),
    (FunctionIdentifier("lcm"), info("lcm"),
      (es: Seq[Expression]) => graft.functions.Lcm(asLong(es(0)), asLong(es(1)))),
    (FunctionIdentifier("morton_encode"), info("morton_encode"),
      (es: Seq[Expression]) => graft.functions.MortonEncode2(asLong(es(0)), asLong(es(1)),
        if (es.length > 2) intLit(es(2), "morton bits") else 16)),
    (FunctionIdentifier("morton_decode"), info("morton_decode"),
      (es: Seq[Expression]) => graft.functions.MortonDecode2(asLong(es(0)),
        if (es.length > 1) intLit(es(1), "morton bits") else 16)),
    (FunctionIdentifier("hilbert_encode"), info("hilbert_encode"),
      (es: Seq[Expression]) => graft.functions.HilbertEncode2(asLong(es(0)), asLong(es(1)),
        if (es.length > 2) intLit(es(2), "hilbert bits") else 16)),
    (FunctionIdentifier("hilbert_decode"), info("hilbert_decode"),
      (es: Seq[Expression]) => graft.functions.HilbertDecode2(asLong(es(0)),
        if (es.length > 1) intLit(es(1), "hilbert bits") else 16)),
    (FunctionIdentifier("base58_encode"), info("base58_encode"),
      (es: Seq[Expression]) => graft.functions.Base58Encode(es.head)),
    (FunctionIdentifier("base58_decode"), info("base58_decode"),
      (es: Seq[Expression]) => graft.functions.Base58Decode(es.head)),
    (FunctionIdentifier("base58_decode_strict"), info("base58_decode_strict"),
      (es: Seq[Expression]) => graft.functions.Base58DecodeStrict(es.head)),
    (FunctionIdentifier("base32_decode_strict"), info("base32_decode_strict"),
      (es: Seq[Expression]) => graft.functions.Base32DecodeStrict(es.head)),
    (FunctionIdentifier("base64_decode_strict"), info("base64_decode_strict"),
      (es: Seq[Expression]) => graft.functions.Base64DecodeStrict(es.head, false)),
    (FunctionIdentifier("base64url_decode_strict"), info("base64url_decode_strict"),
      (es: Seq[Expression]) => graft.functions.Base64DecodeStrict(es.head, true)),
    (FunctionIdentifier("base64url_encode"), info("base64url_encode"),
      (es: Seq[Expression]) => graft.functions.Base64UrlEncode(es.head)),
    (FunctionIdentifier("base64_decode_try"), info("base64_decode_try"),
      (es: Seq[Expression]) => graft.functions.Base64DecodeTry(es.head, false)),
    (FunctionIdentifier("base64url_decode_try"), info("base64url_decode_try"),
      (es: Seq[Expression]) => graft.functions.Base64DecodeTry(es.head, true)),
    (FunctionIdentifier("idna_encode"), info("idna_encode"),
      (es: Seq[Expression]) => graft.functions.IdnaEncode(es.head)),
    (FunctionIdentifier("idna_decode"), info("idna_decode"),
      (es: Seq[Expression]) => graft.functions.IdnaDecode(es.head)),
    (FunctionIdentifier("damerau_levenshtein"), info("damerau_levenshtein"),
      (es: Seq[Expression]) => graft.functions.StringDistances.DamerauLevenshtein(es(0), es(1))),
    (FunctionIdentifier("jaro_similarity"), info("jaro_similarity"),
      (es: Seq[Expression]) => graft.functions.StringDistances.JaroSim(es(0), es(1))),
    (FunctionIdentifier("jaro_winkler_similarity"), info("jaro_winkler_similarity"),
      (es: Seq[Expression]) => graft.functions.StringDistances.JaroWinklerSim(es(0), es(1))),
    (FunctionIdentifier("byte_hamming_distance"), info("byte_hamming_distance"),
      (es: Seq[Expression]) => graft.functions.StringDistances.ByteHammingDistance(es(0), es(1))),
    (FunctionIdentifier("string_jaccard_index"), info("string_jaccard_index"),
      (es: Seq[Expression]) => graft.functions.StringDistances.StringJaccardIndex(es(0), es(1))),
    (FunctionIdentifier("extract_text_from_html"), info("extract_text_from_html"),
      (es: Seq[Expression]) => graft.functions.Html.ExtractTextFromHtml(es.head)),
    (FunctionIdentifier("erf"), info("erf"),
      (es: Seq[Expression]) => graft.functions.ChMath.Erf(asDouble(es.head))),
    (FunctionIdentifier("erfc"), info("erfc"),
      (es: Seq[Expression]) => graft.functions.ChMath.Erfc(asDouble(es.head))),
    (FunctionIdentifier("byte_swap"), info("byte_swap"),
      (es: Seq[Expression]) => graft.functions.ByteSwap(asLong(es.head))),
    (FunctionIdentifier("lemmatize_dict"), info("lemmatize_dict"),
      (es: Seq[Expression]) => dictLookup(
        Literal.create(graft.llm.Nlp.lemmaDict.toMap,
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)),
        es.head, identity)),
    (FunctionIdentifier("synonyms_dict"), info("synonyms_dict"),
      (es: Seq[Expression]) => dictLookup(
        Literal.create(graft.llm.Nlp.synonymSets.flatMap(s => s.map(w => w -> s)).toMap,
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType))),
        es.head,
        _ => Literal.create(Seq.empty[String],
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))),
    (FunctionIdentifier("token_ngrams"), info("token_ngrams"),
      (es: Seq[Expression]) =>
        graft.functions.TokenNgrams(es(0), intLit(es(1), "ngram size"))),
    (FunctionIdentifier("base32_encode"), info("base32_encode"),
      (es: Seq[Expression]) => graft.functions.Base32Encode(es.head)),
    (FunctionIdentifier("base32_decode"), info("base32_decode"),
      (es: Seq[Expression]) => graft.functions.Base32Decode(es.head)),
    (FunctionIdentifier("bech32_encode"), info("bech32_encode"),
      (es: Seq[Expression]) => graft.functions.Bech32Encode(es(0), es(1),
        if (es.length > 2) intLit(es(2), "witness version") else 0)),
    (FunctionIdentifier("bech32_decode"), info("bech32_decode"),
      (es: Seq[Expression]) => graft.functions.Bech32Decode(es.head)),
    (FunctionIdentifier("sparse_grams"), info("sparse_grams"),
      (es: Seq[Expression]) => graft.functions.SparseGrams(es.head,
        if (es.length > 1) intLit(es(1), "min ngram length") else 3)),
    (FunctionIdentifier("detect_charset"), info("detect_charset"),
      (es: Seq[Expression]) => graft.functions.DetectCharset(
        org.apache.spark.sql.catalyst.expressions.Cast(es.head,
          org.apache.spark.sql.types.BinaryType))),
    (FunctionIdentifier("jump_consistent_hash"), info("jump_consistent_hash"),
      (es: Seq[Expression]) => graft.functions.JumpConsistentHash(asLong(es(0)),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1),
          org.apache.spark.sql.types.IntegerType))),
    (FunctionIdentifier("detect_language"), info("detect_language"),
      (es: Seq[Expression]) => graft.functions.DetectLanguage(es.head)),
    (FunctionIdentifier("detect_language_mixed"), info("detect_language_mixed"),
      (es: Seq[Expression]) => graft.functions.DetectLanguageMixed(es.head)),
    (FunctionIdentifier("normalize_utf8"), info("normalize_utf8"),
      (es: Seq[Expression]) => graft.functions.NormalizeUtf8(es(0), es(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString.toUpperCase
        case other => throw new IllegalArgumentException(
          s"normalization form must be a string literal, got $other")
      })),
    (FunctionIdentifier("normalize_query"), info("normalize_query"),
      (es: Seq[Expression]) => normalizeQueryExpr(es.head)),
    (FunctionIdentifier("normalized_query_hash"), info("normalized_query_hash"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(normalizeQueryExpr(es.head)), 42L))
  ) ++ hashCompat

  /** Reference-value-compatible hash family (functions/HashCompat.scala).
    * Multi-arg city/sip/murmur2_64/xx64 fold per-argument hashes with the
    * reference's combineHashes; for cityHash64 integral args use
    * intHash64 (use_int_hash_for_pods — FunctionsHashing.h:277-279). */
  private def hashCompat: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.functions.{ChHash32, ChHash64, ChHash128, ChHashCombine, ChIntHash}
    // POD per the reference's use_int_hash_for_pods branch: fixed-width
    // numerics, bools and dates (FunctionsHashing.h:895-901). Timestamps
    // stay on the byte path (documented at HashInput: DateTime64(6)).
    def isIntegral(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.BooleanType | org.apache.spark.sql.types.DateType => true
      case _ => false
    }
    // POD bits for use_int_hash_for_pods algos: the reference bit_casts at
    // the value's ORIGINAL width into a zeroed UInt64 (zero-extension —
    // FunctionsHashing.h:898 bit_cast<UInt64>), so Int32 -1 hashes as
    // 0xFFFFFFFF, not sign-extended. ChReinterpret("u64") is exactly that
    // zero-extending bit_cast for every numeric width incl. floats.
    // (Contrast intHash32/intHash64 the SQL functions, which convert via
    // C++ implicit UInt64 conversion — sign-extending — h:177,188; those
    // keep the plain Cast below.)
    def podBits(e: Expression): Expression =
      graft.functions.ChReinterpret(e, "u64")
    // per-arg hash for combinable 64-bit functions, then left-fold combine
    def fold64(algo: String, podsAsIntHash: Boolean)(es: Seq[Expression]): Expression = {
      require(es.nonEmpty, s"$algo needs at least one argument")
      es.map { e =>
        if (podsAsIntHash && isIntegral(e)) ChIntHash(podBits(e), 64)
        else ChHash64(e, algo): Expression
      }.reduceLeft((a, b) => ChHashCombine(a, b, algo))
    }
    // Multi-arg calls fold per-argument hashes with the reference's
    // per-function combineHashes (ChHashCombine.methodFor); functions the
    // reference declares non-combinable (javaHash family, CRC) fail loudly
    // instead of silently hashing only the first argument.
    def one64(name: String, algo: String) =
      (FunctionIdentifier(name), info(name),
        (es: Seq[Expression]) =>
          if (graft.functions.ChHashCombine.combinable(algo))
            fold64(algo, podsAsIntHash = false)(es)
          else {
            require(es.length == 1,
              s"$name is not combineable for multiple arguments")
            ChHash64(es.head, algo): Expression
          })
    def one32(name: String, algo: String) =
      (FunctionIdentifier(name), info(name),
        (es: Seq[Expression]) => {
          require(es.length == 1,
            s"$name is not combineable for multiple arguments")
          ChHash32(es.head, algo): Expression
        })
    def one128(name: String, algo: String) =
      (FunctionIdentifier(name), info(name),
        (es: Seq[Expression]) => {
          require(es.nonEmpty, s"$name needs at least one argument")
          es.map(e => ChHash128(e, algo): Expression)
            .reduceLeft((a, b) => graft.functions.Ch128Combine(a, b, algo))
        })
    Seq(
      (FunctionIdentifier("ch_cityhash64"), info("ch_cityhash64"),
        (es: Seq[Expression]) => fold64("cityHash64", podsAsIntHash = true)(es)),
      (FunctionIdentifier("ch_siphash64"), info("ch_siphash64"),
        (es: Seq[Expression]) => fold64("sipHash64", podsAsIntHash = false)(es)),
      (FunctionIdentifier("ch_murmur2_64"), info("ch_murmur2_64"),
        (es: Seq[Expression]) => fold64("murmurHash2_64", podsAsIntHash = false)(es)),
      (FunctionIdentifier("ch_xxhash64"), info("ch_xxhash64"),
        (es: Seq[Expression]) => fold64("xxHash64", podsAsIntHash = false)(es)),
      // farm/metro are use_int_hash_for_pods=true like city (h:642,656,672)
      (FunctionIdentifier("ch_farmhash64"), info("ch_farmhash64"),
        (es: Seq[Expression]) => fold64("farmHash64", podsAsIntHash = true)(es)),
      (FunctionIdentifier("ch_farmfingerprint64"), info("ch_farmfingerprint64"),
        (es: Seq[Expression]) => fold64("farmFingerprint64", podsAsIntHash = true)(es)),
      (FunctionIdentifier("ch_metrohash64"), info("ch_metrohash64"),
        (es: Seq[Expression]) => fold64("metroHash64", podsAsIntHash = true)(es)),
      one64("ch_murmur2_32", "murmurHash2_32u"),
      one64("ch_gcc_murmur", "gccMurmurHash"),
      one64("ch_kafka_murmur", "kafkaMurmurHash"),
      one64("ch_murmur3_32", "murmurHash3_32"),
      one64("ch_murmur3_64", "murmurHash3_64"),
      one64("ch_xxhash32", "xxHash32"),
      one64("ch_wyhash64", "wyHash64"),
      one64("ch_halfmd5", "halfMD5"),
      one64("ch_crc32", "crc32"),
      one64("ch_crc32ieee", "crc32IEEE"),
      one64("ch_crc64", "crc64"),
      one32("ch_javahash", "javaHash"),
      one32("ch_javahash_utf16le", "javaHashUTF16LE"),
      one32("ch_hivehash", "hiveHash"),
      one128("ch_siphash128", "sipHash128"),
      one128("ch_siphash128_reference", "sipHash128Reference"),
      one128("ch_murmur3_128", "murmurHash3_128"),
      (FunctionIdentifier("ch_inthash32"), info("ch_inthash32"),
        (es: Seq[Expression]) => ChIntHash(asLong(es.head), 32)),
      (FunctionIdentifier("ch_inthash64"), info("ch_inthash64"),
        (es: Seq[Expression]) => ChIntHash(asLong(es.head), 64)),
      (FunctionIdentifier("string_bytes_uniq"), info("string_bytes_uniq"),
        (es: Seq[Expression]) => graft.functions.StringBytesUniq(es.head)),
      (FunctionIdentifier("string_bytes_entropy"), info("string_bytes_entropy"),
        (es: Seq[Expression]) => graft.functions.StringBytesEntropy(es.head)),
      (FunctionIdentifier("ch_replace_regexp_one"), info("ch_replace_regexp_one"),
        (es: Seq[Expression]) => graft.functions.ChReplaceRegexpOne(es(0), es(1), es(2)))
    ) ++ stringShingles ++ reinterprets ++ batch17 ++ batch20 ++ batch21 ++ batch22 ++ batch23
  }

  /** Round-10 batch 23 (functions/Batch23.scala): digests + id tail. */
  private def batch23: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq("md4", "ripemd160", "keccak256", "blake3", "sha512_256").map { algo =>
      (FunctionIdentifier(s"ch_$algo"), info(s"ch_$algo"),
        (es: Seq[Expression]) => graft.functions.ChDigest(es.head, algo): Expression)
    } ++ Seq(
      (FunctionIdentifier("kostik_consistent_hash"), info("kostik_consistent_hash"),
        (es: Seq[Expression]) => graft.functions.KostikConsistentHashExpr(asLong(es(0)), es(1))),
      (FunctionIdentifier("generate_ulid"), info("generate_ulid"),
        (_: Seq[Expression]) => graft.functions.GenerateUlid()),
      (FunctionIdentifier("generate_serial_id"), info("generate_serial_id"),
        (es: Seq[Expression]) => graft.functions.GenerateSerialId(es.head)),
      (FunctionIdentifier("fuzz_bits"), info("fuzz_bits"),
        (es: Seq[Expression]) => graft.functions.FuzzBitsExpr(es(0), es(1))),
      (FunctionIdentifier("to_bfloat16"), info("to_bfloat16"),
        (es: Seq[Expression]) => graft.functions.ToBFloat16Expr(asDouble(es.head))),
      (FunctionIdentifier("json_all_paths"), info("json_all_paths"),
        (es: Seq[Expression]) => graft.functions.JsonAllPaths(es.head, withTypes = false)),
      (FunctionIdentifier("json_all_paths_with_types"), info("json_all_paths_with_types"),
        (es: Seq[Expression]) => graft.functions.JsonAllPaths(es.head, withTypes = true)),
      (FunctionIdentifier("ch_lgamma"), info("ch_lgamma"),
        (es: Seq[Expression]) => graft.functions.GammaExpr(asDouble(es.head), logForm = true)),
      (FunctionIdentifier("ch_tgamma"), info("ch_tgamma"),
        (es: Seq[Expression]) => graft.functions.GammaExpr(asDouble(es.head), logForm = false)),
      (FunctionIdentifier("convert_charset"), info("convert_charset"),
        (es: Seq[Expression]) => graft.functions.ConvertCharsetExpr(es)),
      (FunctionIdentifier("ipv6_cidr_to_range"), info("ipv6_cidr_to_range"),
        (es: Seq[Expression]) => graft.functions.Ipv6CidrToRangeExpr(es(0), es(1))),
      // round-10 batch 30 (functions/Batch30.scala)
      (FunctionIdentifier("error_code_to_name"), info("error_code_to_name"),
        (es: Seq[Expression]) => graft.functions.ErrorCodeToName(es.head)),
      (FunctionIdentifier("uniq_theta_singleton"), info("uniq_theta_singleton"),
        (es: Seq[Expression]) => graft.functions.ThetaSingletonState(asLong(es.head)))
    ) ++ s2Family ++ regionFamily ++ h3Family

  /** Round-10 batch 34 (functions/H3Cells.scala): the index-arithmetic
    * H3 subset. */
  private def h3Family: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq("resolution", "baseCell", "isValid", "isPentagon", "isResClassIII",
        "toString", "stringTo", "numHexagons", "pentagonIndexes",
        "edgeOrigin", "edgeIsValid", "edgesFromHexagon").map { kind =>
      val n = s"h3_${kind.toLowerCase}"
      (FunctionIdentifier(n), info(n),
        (es: Seq[Expression]) => graft.functions.H3Unary(es.head, kind): Expression)
    } ++ Seq("toParent", "toCenterChild", "toChildren").map { kind =>
      val n = s"h3_${kind.toLowerCase}"
      (FunctionIdentifier(n), info(n),
        (es: Seq[Expression]) => graft.functions.H3WithRes(es(0), es(1), kind): Expression)
    } ++ Seq(
      (FunctionIdentifier("h3_res0_indexes"), info("h3_res0_indexes"),
        (_: Seq[Expression]) => graft.functions.H3Res0Indexes(): Expression),
      // round-10 batch 35 (functions/Sqids.scala)
      (FunctionIdentifier("sqid_encode"), info("sqid_encode"),
        (es: Seq[Expression]) => graft.functions.SqidEncode(es): Expression),
      (FunctionIdentifier("sqid_decode"), info("sqid_decode"),
        (es: Seq[Expression]) => graft.functions.SqidDecode(es.head): Expression))

  /** Round-10 batch 32 (functions/Batch32.scala): embedded-geobase
    * region functions. The optional second geobase-selector argument of
    * the reference is accepted and ignored (one loaded geobase here). */
  private def regionFamily: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq("city", "area", "district", "country", "continent",
        "topContinent", "population").map { kind =>
      val n = s"region_to_${kind.toLowerCase}"
      (FunctionIdentifier(n), info(n),
        (es: Seq[Expression]) => graft.functions.RegionLookup(es.head, kind)
          : Expression)
    } ++ Seq(
      (FunctionIdentifier("region_to_name"), info("region_to_name"),
        (es: Seq[Expression]) => graft.functions.RegionToName(es.head): Expression),
      (FunctionIdentifier("region_in"), info("region_in"),
        (es: Seq[Expression]) => graft.functions.RegionIn(es(0), es(1)): Expression),
      (FunctionIdentifier("region_hierarchy"), info("region_hierarchy"),
        (es: Seq[Expression]) => graft.functions.RegionHierarchy(es.head): Expression))

  /** Round-10 batch 25 (functions/S2Cells.scala): the real S2 id space. */
  private def s2Family: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("geo_to_s2"), info("geo_to_s2"),
      (es: Seq[Expression]) => graft.functions.GeoToS2(asDouble(es(0)), asDouble(es(1)))),
    (FunctionIdentifier("s2_to_geo"), info("s2_to_geo"),
      (es: Seq[Expression]) => graft.functions.S2ToGeo(asLong(es.head))),
    (FunctionIdentifier("s2_get_neighbors"), info("s2_get_neighbors"),
      (es: Seq[Expression]) => graft.functions.S2GetNeighbors(asLong(es.head))),
    (FunctionIdentifier("s2_cells_intersect"), info("s2_cells_intersect"),
      (es: Seq[Expression]) => graft.functions.S2CellsIntersect(asLong(es(0)), asLong(es(1)))),
    (FunctionIdentifier("s2_cap_contains"), info("s2_cap_contains"),
      (es: Seq[Expression]) => graft.functions.S2Op(
        Seq(asLong(es(0)), asDouble(es(1)), asLong(es(2))), "capContains")),
    (FunctionIdentifier("s2_cap_union"), info("s2_cap_union"),
      (es: Seq[Expression]) => graft.functions.S2Op(
        Seq(asLong(es(0)), asDouble(es(1)), asLong(es(2)), asDouble(es(3))), "capUnion")),
    (FunctionIdentifier("s2_rect_contains"), info("s2_rect_contains"),
      (es: Seq[Expression]) => graft.functions.S2Op(es.map(asLong), "rectContains")),
    (FunctionIdentifier("s2_rect_add"), info("s2_rect_add"),
      (es: Seq[Expression]) => graft.functions.S2Op(es.map(asLong), "rectAdd")),
    (FunctionIdentifier("s2_rect_union"), info("s2_rect_union"),
      (es: Seq[Expression]) => graft.functions.S2Op(es.map(asLong), "rectUnion")),
    (FunctionIdentifier("s2_rect_intersection"), info("s2_rect_intersection"),
      (es: Seq[Expression]) => graft.functions.S2Op(es.map(asLong), "rectIntersection")),
    (FunctionIdentifier("s2_face_ij"), info("s2_face_ij"),
      (es: Seq[Expression]) => graft.functions.S2Op(es.map(asDouble), "faceIJ"))
  )

  /** Round-10 batch 22 (functions/Batch22.scala): introspection/context. */
  private def batch22: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("byte_size"), info("byte_size"),
      (es: Seq[Expression]) => graft.functions.ByteSizeExpr(es.head)),
    (FunctionIdentifier("is_nullable_col"), info("is_nullable_col"),
      (es: Seq[Expression]) => graft.functions.IsNullableExpr(es.head)),
    (FunctionIdentifier("is_constant_col"), info("is_constant_col"),
      (es: Seq[Expression]) => graft.functions.IsConstantExpr(es.head)),
    (FunctionIdentifier("default_value_of_arg"), info("default_value_of_arg"),
      (es: Seq[Expression]) => graft.functions.DefaultValueOfArgExpr(es.head)),
    (FunctionIdentifier("is_ip_in_range"), info("is_ip_in_range"),
      (es: Seq[Expression]) => graft.functions.IsIpInRange(es(0), es(1))),
    (FunctionIdentifier("parse_time_delta"), info("parse_time_delta"),
      (es: Seq[Expression]) => graft.functions.ParseTimeDeltaExpr(es.head)),
    (FunctionIdentifier("is_decimal_overflow"), info("is_decimal_overflow"),
      (es: Seq[Expression]) => graft.functions.IsDecimalOverflowExpr(es)),
    (FunctionIdentifier("ch_siphash64_keyed"), info("ch_siphash64_keyed"),
      (es: Seq[Expression]) => graft.functions.ChSipKeyed(es, "64")),
    (FunctionIdentifier("ch_siphash128_keyed"), info("ch_siphash128_keyed"),
      (es: Seq[Expression]) => graft.functions.ChSipKeyed(es, "128")),
    (FunctionIdentifier("ch_siphash128_reference_keyed"), info("ch_siphash128_reference_keyed"),
      (es: Seq[Expression]) => graft.functions.ChSipKeyed(es, "128ref"))
  )

  /** Round-10 batch 21 (functions/Batch21.scala): tuple/vector arithmetic
    * and the array tail. */
  private def batch21: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    val tupleOps = Seq("plus", "minus", "multiply", "divide", "modulo",
      "intDiv", "intDivOrZero").flatMap { op =>
      val snake = op.replaceAll("([A-Z])", "_$1").toLowerCase
      Seq(
        (FunctionIdentifier(s"tuple_$snake"), info(s"tuple_$snake"),
          (es: Seq[Expression]) => graft.functions.TupleArith(es(0), es(1), op)),
        (FunctionIdentifier(s"tuple_${snake}_by_number"), info(s"tuple_${snake}_by_number"),
          (es: Seq[Expression]) => graft.functions.TupleArithByNumber(es(0), es(1), op)))
    }
    tupleOps ++ Seq(
      (FunctionIdentifier("tuple_negate"), info("tuple_negate"),
        (es: Seq[Expression]) => graft.functions.TupleNegateExpr(es.head)),
      (FunctionIdentifier("tuple_concat"), info("tuple_concat"),
        (es: Seq[Expression]) => graft.functions.TupleConcatExpr(es)),
      (FunctionIdentifier("tuple_names"), info("tuple_names"),
        (es: Seq[Expression]) => graft.functions.TupleNamesExpr(es.head)),
      (FunctionIdentifier("tuple_to_name_value_pairs"), info("tuple_to_name_value_pairs"),
        (es: Seq[Expression]) => graft.functions.TupleToNameValuePairsExpr(es.head)),
      (FunctionIdentifier("tuple_hamming_distance"), info("tuple_hamming_distance"),
        (es: Seq[Expression]) => graft.functions.TupleHammingDistanceExpr(es(0), es(1))),
      (FunctionIdentifier("flatten_tuple"), info("flatten_tuple"),
        (es: Seq[Expression]) => graft.functions.FlattenTupleExpr(es.head)),
      (FunctionIdentifier("array_pr_auc"), info("array_pr_auc"),
        (es: Seq[Expression]) => graft.functions.ChArrayPRAUC(es(0), es(1))),
      (FunctionIdentifier("empty_array_to_single"), info("empty_array_to_single"),
        (es: Seq[Expression]) => graft.functions.ChEmptyArrayToSingle(es.head)),
      (FunctionIdentifier("ch_partial_shuffle"), info("ch_partial_shuffle"),
        (es: Seq[Expression]) => graft.functions.ChPartialShuffle(es))
    )
  }

  /** Round-10 batch 20 (functions/Batch20.scala). */
  private def batch20: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fuzzy_substr_dist"), info("fuzzy_substr_dist"),
      (es: Seq[Expression]) => graft.functions.SubstrEditDistance(es(0), es(1))),
    (FunctionIdentifier("compare_substrings"), info("compare_substrings"),
      (es: Seq[Expression]) => graft.functions.ChCompareSubstrings(es)),
    (FunctionIdentifier("bit_slice"), info("bit_slice"),
      (es: Seq[Expression]) => graft.functions.BitSliceExpr(es)),
    (FunctionIdentifier("ch_bin"), info("ch_bin"),
      (es: Seq[Expression]) => graft.functions.ChBin(es.head)),
    (FunctionIdentifier("ch_unbin"), info("ch_unbin"),
      (es: Seq[Expression]) => graft.functions.ChUnbin(es.head)),
    (FunctionIdentifier("decode_html_component"), info("decode_html_component"),
      (es: Seq[Expression]) => graft.functions.DecodeHtmlComponent(es.head)),
    (FunctionIdentifier("string_jaccard_chars"), info("string_jaccard_chars"),
      (es: Seq[Expression]) => graft.functions.JaccardCharsUTF8(es(0), es(1)))
  )

  /** Round-9 batch 17 (functions/Batch17.scala). */
  private def batch17: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("min_sample_size_continuous"), info("min_sample_size_continuous"),
      (es: Seq[Expression]) => graft.functions.ChMinSampleSize(es.map(asDouble), continuous = true)),
    (FunctionIdentifier("min_sample_size_conversion"), info("min_sample_size_conversion"),
      (es: Seq[Expression]) => graft.functions.ChMinSampleSize(es.map(asDouble), continuous = false)),
    (FunctionIdentifier("array_normalized_gini"), info("array_normalized_gini"),
      (es: Seq[Expression]) => graft.functions.ChNormalizedGini(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))),
    (FunctionIdentifier("json_merge_patch"), info("json_merge_patch"),
      (es: Seq[Expression]) => es.reduceLeft((a, b) => graft.functions.ChJsonMergePatch(a, b))),
    (FunctionIdentifier("punycode_encode"), info("punycode_encode"),
      (es: Seq[Expression]) => graft.functions.PunycodeEncode(es.head)),
    (FunctionIdentifier("punycode_decode"), info("punycode_decode"),
      (es: Seq[Expression]) => graft.functions.PunycodeDecode(es.head, nullOnError = false)),
    (FunctionIdentifier("try_punycode_decode"), info("try_punycode_decode"),
      (es: Seq[Expression]) => graft.functions.PunycodeDecode(es.head, nullOnError = true)),
    (FunctionIdentifier("uniq_theta_union"), info("uniq_theta_union"),
      (es: Seq[Expression]) => graft.functions.ThetaSetOpExpr(es(0), es(1), "union")),
    (FunctionIdentifier("uniq_theta_union_count"), info("uniq_theta_union_count"),
      (es: Seq[Expression]) => graft.functions.ThetaSetOpExpr(es(0), es(1), "union_count")),
    (FunctionIdentifier("uniq_theta_intersect_count"), info("uniq_theta_intersect_count"),
      (es: Seq[Expression]) => graft.functions.ThetaSetOpExpr(es(0), es(1), "intersect_count")),
    (FunctionIdentifier("uniq_theta_not_count"), info("uniq_theta_not_count"),
      (es: Seq[Expression]) => graft.functions.ThetaSetOpExpr(es(0), es(1), "not_count")),
    (FunctionIdentifier("uniq_theta_estimate"), info("uniq_theta_estimate"),
      (es: Seq[Expression]) => graft.functions.ThetaEstimate(es.head))
  )

  /** reinterpretAs* family (functions/Reinterpret.scala). One SQL name per
    * target; the dialect maps reinterpretAsUInt32 -> ch_reinterpret_u32. */
  private def reinterprets: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq("u8", "u16", "u32", "u64", "i8", "i16", "i32", "i64",
        "f32", "f64", "date", "datetime", "string",
        "u128", "i128", "u256", "i256", "uuid", "fixedstring").map { t =>
      val name = s"ch_reinterpret_$t"
      (FunctionIdentifier(name), info(name),
        (es: Seq[Expression]) => graft.functions.ChReinterpret(es.head, t): Expression)
    }

  /** ngram/wordShingle SimHash + MinHash family (functions/
    * StringShingles.scala; reference FunctionsStringHash.cpp). Optional
    * literal args: shingle size (default 3) and, for minhash, num_hashes
    * (default 6) — FunctionsStringHash.h:33-34. */
  private def stringShingles: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.functions.{ChStringMinHash, ChStringMinHashArg, ChStringSimHash}
    def nArg(es: Seq[Expression]): Int =
      if (es.length > 1) scaleLit(es(1), "shingle size") else 3
    def kArg(es: Seq[Expression]): Int =
      if (es.length > 2) scaleLit(es(2), "num hashes") else 6
    def sim(name: String, ci: Boolean, utf8: Boolean, ngram: Boolean) =
      (FunctionIdentifier(name), info(name), (es: Seq[Expression]) =>
        ChStringSimHash(es.head, nArg(es), ci, utf8, ngram): Expression)
    def mh(name: String, ci: Boolean, utf8: Boolean, ngram: Boolean) =
      (FunctionIdentifier(name), info(name), (es: Seq[Expression]) =>
        ChStringMinHash(es.head, nArg(es), kArg(es), ci, utf8, ngram): Expression)
    def mha(name: String, ci: Boolean, utf8: Boolean, ngram: Boolean) =
      (FunctionIdentifier(name), info(name), (es: Seq[Expression]) =>
        ChStringMinHashArg(es.head, nArg(es), kArg(es), ci, utf8, ngram): Expression)
    Seq(
      sim("ch_ngram_simhash", ci = false, utf8 = false, ngram = true),
      sim("ch_ngram_simhash_ci", ci = true, utf8 = false, ngram = true),
      sim("ch_ngram_simhash_utf8", ci = false, utf8 = true, ngram = true),
      sim("ch_ngram_simhash_ci_utf8", ci = true, utf8 = true, ngram = true),
      sim("ch_wordshingle_simhash", ci = false, utf8 = false, ngram = false),
      sim("ch_wordshingle_simhash_ci", ci = true, utf8 = false, ngram = false),
      mh("ch_ngram_minhash", ci = false, utf8 = false, ngram = true),
      mh("ch_ngram_minhash_ci", ci = true, utf8 = false, ngram = true),
      mh("ch_ngram_minhash_utf8", ci = false, utf8 = true, ngram = true),
      mh("ch_ngram_minhash_ci_utf8", ci = true, utf8 = true, ngram = true),
      mh("ch_wordshingle_minhash", ci = false, utf8 = false, ngram = false),
      mh("ch_wordshingle_minhash_ci", ci = true, utf8 = false, ngram = false),
      mha("ch_ngram_minhash_arg", ci = false, utf8 = false, ngram = true),
      mha("ch_ngram_minhash_arg_ci", ci = true, utf8 = false, ngram = true),
      mha("ch_ngram_minhash_arg_utf8", ci = false, utf8 = true, ngram = true),
      mha("ch_ngram_minhash_arg_ci_utf8", ci = true, utf8 = true, ngram = true),
      mha("ch_wordshingle_minhash_arg", ci = false, utf8 = false, ngram = false),
      mha("ch_wordshingle_minhash_arg_ci", ci = true, utf8 = false, ngram = false)
    )
  }

  /** Literal-erasure regexp chain of llm.Nlp.normalizeQuery at the
    * Catalyst layer (see dictLookup for why builders can't reuse the
    * Column form). */
  private def normalizeQueryExpr(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => L, RegExpReplace}
    val noStr = RegExpReplace(e, L.create("'([^'\\\\]|\\\\.)*'",
      org.apache.spark.sql.types.StringType), L.create("?",
      org.apache.spark.sql.types.StringType))
    val noNum = RegExpReplace(noStr, L.create("\\b[0-9]+(\\.[0-9]+)?\\b",
      org.apache.spark.sql.types.StringType), L.create("?",
      org.apache.spark.sql.types.StringType))
    RegExpReplace(noNum, L.create("\\?(\\s*,\\s*\\?)+",
      org.apache.spark.sql.types.StringType), L.create("?..",
      org.apache.spark.sql.types.StringType))
  }
}
