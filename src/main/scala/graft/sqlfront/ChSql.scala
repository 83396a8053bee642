package graft.sqlfront

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse-dialect SQL front-end (SURVEY.md §3.1 "thin dialect layer"):
  * rewrites the CH-isms the reference parser accepts
  * (src/Parsers/ParserSelectQuery.cpp: FINAL, PREWHERE, QUALIFY,
  * LIMIT n BY, function-name surface) into Spark SQL, then delegates to
  * Catalyst. This is a pragmatic textual rewriter, not a full parser —
  * it handles the documented constructs on well-formed SELECTs and passes
  * everything else through untouched.
  */
object ChSql {

  /** 1:1 function-name aliases (CH name -> Spark SQL name). */
  val aliases: Map[String, String] = Map(
    // date/time extract
    "toYear" -> "year", "toMonth" -> "month", "toDayOfMonth" -> "day",
    "toHour" -> "hour", "toMinute" -> "minute", "toSecond" -> "second",
    "toDayOfYear" -> "dayofyear", "toQuarter" -> "quarter",
    "toISOWeek" -> "weekofyear",
    "toDayOfWeek" -> "iso_weekday", // template below: CH is Mon=1..Sun=7 (ISO)
    "toUnixTimestamp" -> "unix_timestamp",
    "fromUnixTimestamp" -> "from_unixtime",
    "formatDateTime" -> "date_format",
    "dateDiff" -> "timestampdiff", "date_diff" -> "timestampdiff", // templates below: unit quotes stripped
    "addDays" -> "date_add", "subtractDays" -> "date_sub",
    "makeDate" -> "make_date", "makeDate32" -> "make_date",
    // string
    "lengthUTF8" -> "length", "lowerUTF8" -> "lower", "upperUTF8" -> "upper",
    "substringUTF8" -> "substring", // base substring/mid/substr are BYTE-based (template)
    "positionCaseInsensitive" -> "instr_ci", // template below: lower() both sides
    "concatWithSeparator" -> "concat_ws",
    "splitByChar" -> "split_by_char", // handled by template below
    "match" -> "rlike", "extract" -> "regexp_extract",
    "replaceAll" -> "replace", "replaceRegexpAll" -> "regexp_replace",
    "countSubstrings" -> "regexp_count",
    "editDistance" -> "levenshtein", "levenshteinDistance" -> "levenshtein",
    "damerauLevenshteinDistance" -> "damerau_levenshtein",
    "jaroSimilarity" -> "jaro_similarity",
    "jaroWinklerSimilarity" -> "jaro_winkler_similarity",
    "byteHammingDistance" -> "byte_hamming_distance",
    "stringJaccardIndex" -> "string_jaccard_index",
    "startsWith" -> "startswith", "endsWith" -> "endswith",
    "trimBoth" -> "trim", "trimLeft" -> "ltrim", "trimRight" -> "rtrim",
    "leftPad" -> "lpad", "rightPad" -> "rpad",
    "leftPadUTF8" -> "lpad", "rightPadUTF8" -> "rpad",
    // math / misc
    "modulo" -> "mod", "plus" -> "t",
    "ln" -> "ln", "log2" -> "log2", "log10" -> "log10",
    "roundBankers" -> "t", "cbrt" -> "cbrt",
    "round" -> "t", "floor" -> "t", "ceil" -> "t", "ceiling" -> "t",
    "trunc" -> "t", "truncate" -> "t", "roundDown" -> "t",
    "bitCount" -> "bit_count",
    // conditionals
    "multiIf" -> "case_when_chain", // template below
    "if" -> "if", "ifNull" -> "nvl", "nullIf" -> "nullif",
    "assumeNotNull" -> "coalesce",
    // aggregates
    "uniq" -> "approx_count_distinct", "uniqHLL12" -> "approx_count_distinct",
    "uniqCombined" -> "approx_count_distinct", "uniqExact" -> "count_distinct",
    "groupArray" -> "collect_list", "groupUniqArray" -> "collect_set",
    "anyHeavy" -> "mode", // any/anyLast: batch-29 templates (NULL-skipping)
    "argMin" -> "min_by", "argMax" -> "max_by",
    "avgWeighted" -> "avg_weighted", // template below
    "varPop" -> "var_pop", "varSamp" -> "var_samp",
    "stddevPop" -> "stddev_pop", "stddevSamp" -> "stddev_samp",
    "covarPop" -> "covar_pop", "covarSamp" -> "covar_samp",
    "skewPop" -> "skewness", // kurtPop: batch-29 template (non-excess)
    "medianExact" -> "median", "quantileExact" -> "percentile",
    "quantile" -> "percentile_approx",
    "topK" -> "top_k", // template below (graft custom)
    // arrays
    "arrayJoin" -> "explode", "has" -> "array_contains",
    "arrayConcat" -> "concat", "arraySlice" -> "slice",
    "arrayUniq" -> "array_size_distinct", // template below
    "arrayDistinct" -> "array_distinct", "arraySort" -> "array_sort",
    "arrayReverse" -> "reverse", "arrayFlatten" -> "flatten",
    "arrayCompact" -> "array_compact", "arrayZip" -> "arrays_zip",
    "indexOf" -> "array_position", "arrayElement" -> "ch_element_at",
    
    "arrayCumSum" -> "t",
    "arrayStringConcat" -> "array_join", "emptyArrayString" -> "array",
    // json
    "JSONExtractString" -> "t",
    "JSONLength" -> "json_array_length",
    "toJSONString" -> "to_json",
    "visitParamExtractRaw" -> "get_json_object",
    // hash / encode — value-faithful kernels (functions/HashCompat.scala;
    // reference src/Functions/FunctionsHashing.h): persisted hash values
    // (SAMPLE BY cityHash64, sipHash fingerprints, Kafka partitioning)
    // carry the reference's exact bit patterns
    "cityHash64" -> "ch_cityhash64", "sipHash64" -> "ch_siphash64",
    "sipHash128" -> "ch_siphash128",
    "sipHash128Reference" -> "ch_siphash128_reference",
    "halfMD5" -> "ch_halfmd5", "MD5" -> "md5",
    "hex" -> "hex", "unhex" -> "unhex",
    "base64Encode" -> "t", "base64Decode" -> "t",
    "bitHammingDistance" -> "bit_hamming", // template below

    // ---- extended surface (round 2; reference src/Functions/*) ----
    // date/time
    "toDateTime" -> "to_timestamp", "toDate32" -> "to_date",
    "toLastDayOfMonth" -> "last_day",
    "now" -> "t", "today" -> "t",
    "toDateTimeOrNull" -> "t", "monthName" -> "t", "toMonday" -> "t",
    "addHours" -> "t", "addMinutes" -> "t", "addSeconds" -> "t", // templates
    "addMonths" -> "t", "addYears" -> "t", "addWeeks" -> "t",
    "subtractHours" -> "t", "subtractMinutes" -> "t", "subtractSeconds" -> "t",
    "subtractMonths" -> "t", "subtractYears" -> "t", "subtractWeeks" -> "t",
    "toYYYYMM" -> "t", "toYYYYMMDD" -> "t", "yesterday" -> "t",
    "toStartOfFiveMinutes" -> "t", "toStartOfTenMinutes" -> "t",
    "toStartOfFifteenMinutes" -> "t", "toStartOfInterval" -> "t",
    "toStartOfMinute" -> "t", "timeSlot" -> "t", "toRelativeDayNum" -> "t",
    "fromUnixTimestamp64Milli" -> "timestamp_millis",
    "toUnixTimestamp64Milli" -> "t",
    "parseDateTimeBestEffort" -> "t", "parseDateTimeBestEffortOrNull" -> "t",
    "dateAdd" -> "t", "dateSub" -> "t",
    // string
    // lcase/ucase are aliases of lower/upper (ASCII-only; template below)
    "char_length" -> "length", "character_length" -> "length",
    "reverseUTF8" -> "reverse", "format" -> "format_string",
    "concatAssumeInjective" -> "concat", "substringIndex" -> "substring_index",
    "initcapUTF8" -> "initcap", "isValidUTF8" -> "is_valid_utf8",
    "countMatches" -> "regexp_count", "regexpExtract" -> "regexp_extract",
    "translateUTF8" -> "translate",
    "appendTrailingCharIfAbsent" -> "t", "tokens" -> "t", "alphaTokens" -> "t",
    "splitByWhitespace" -> "t", "splitByString" -> "t", "extractAll" -> "t",
    "ngramDistance" -> "t", "ngramSearch" -> "t",
    "multiSearchAny" -> "t", "multiSearchFirstPosition" -> "t",
    "multiSearchFirstIndex" -> "t", "multiSearchAnyCaseInsensitive" -> "t",
    "multiMatchAny" -> "t", "multiMatchAnyIndex" -> "t",
    "encrypt" -> "t", "decrypt" -> "t", "tryDecrypt" -> "t",
    "hasToken" -> "t", "hasTokenCaseInsensitive" -> "t",
    "positionUTF8" -> "instr", "firstLine" -> "t",
    // hash / encoding
    "SHA1" -> "sha1", "SHA224" -> "t", "SHA256" -> "t", "SHA384" -> "t",
    "SHA512" -> "t",
    // faithful murmur/xx/int/java/crc/farm/metro kernels (HashCompat.scala);
    // farmHash64 matches a stock (SSE4.2) reference build for inputs
    // < 512 B, the scalar build above that (upstream Hash64 is
    // build-dependent there — see HashCompat header); farmFingerprint64
    // and metroHash64 are exact at every length
    "murmurHash2_32" -> "ch_murmur2_32", "murmurHash2_64" -> "ch_murmur2_64",
    "murmurHash3_32" -> "ch_murmur3_32", "murmurHash3_64" -> "ch_murmur3_64",
    "murmurHash3_128" -> "ch_murmur3_128",
    "gccMurmurHash" -> "ch_gcc_murmur", "kafkaMurmurHash" -> "ch_kafka_murmur",
    "xxHash32" -> "ch_xxhash32", "xxHash64" -> "ch_xxhash64",
    "wyHash64" -> "ch_wyhash64",
    "javaHash" -> "ch_javahash", "javaHashUTF16LE" -> "ch_javahash_utf16le",
    "hiveHash" -> "ch_hivehash",
    "intHash32" -> "ch_inthash32", "intHash64" -> "ch_inthash64",
    "farmHash64" -> "ch_farmhash64", "metroHash64" -> "ch_metrohash64",
    "farmFingerprint64" -> "ch_farmfingerprint64",
    "CRC32" -> "ch_crc32", "CRC32IEEE" -> "ch_crc32ieee", "CRC64" -> "ch_crc64",
    "encodeURLComponent" -> "url_encode", "decodeURLComponent" -> "url_decode",
    // query pretty-printer (reference src/Functions/formatQuery.cpp)
    "formatQuery" -> "format_query",
    "formatQueryOrNull" -> "format_query_or_null",
    "formatQuerySingleLine" -> "format_query_single_line",
    "formatQuerySingleLineOrNull" -> "format_query_single_line_or_null",
    // URL
    "protocol" -> "t", "domain" -> "t", "domainWithoutWWW" -> "t",
    "topLevelDomain" -> "t", "pathOnly" -> "t", "queryString" -> "t",
    "fragment" -> "t", "extractURLParameter" -> "t", "cutQueryString" -> "t",
    // JSON
    "JSONExtractInt" -> "t", "JSONExtractFloat" -> "t", "JSONExtractBool" -> "t",
    "JSONExtractRaw" -> "get_json_object", "JSONHas" -> "t",
    "JSONExtractKeys" -> "json_object_keys", "JSONArrayLength" -> "json_array_length",
    "isValidJSON" -> "t",
    // arrays
    "arrayPushBack" -> "array_append", "arrayPushFront" -> "array_prepend",
    "arrayPopBack" -> "t", "arrayPopFront" -> "t",
    "arrayIntersect" -> "array_intersect", "arrayUnion" -> "array_union",
    "hasAll" -> "t", "hasAny" -> "arrays_overlap",
    "arrayFirst" -> "t", "arrayLast" -> "t", "arrayFirstIndex" -> "t",
    "arrayMin" -> "t", "arrayMax" -> "t",
    "arrayAvg" -> "t", "arrayProduct" -> "t", "arrayWithConstant" -> "t",
    "arrayEnumerate" -> "t", "arrayReverseSort" -> "t", "countEqual" -> "t",
    "arrayElementOrNull" -> "try_element_at",
    // map
    "mapKeys" -> "map_keys", "mapValues" -> "map_values",
    "mapContains" -> "map_contains_key", "mapFromArrays" -> "map_from_arrays",
    // math
    "sqr" -> "t", "sigmoid" -> "t", "exp2" -> "t", "exp10" -> "t",
    "intExp2" -> "t", "intExp10" -> "t", "roundToExp2" -> "t",
    "min2" -> "least", "max2" -> "greatest",
    "isFinite" -> "t", "isInfinite" -> "t", "isNaN" -> "isnan",
    "log1p" -> "log1p", "expm1" -> "expm1", "hypot" -> "hypot",
    // bits
    "bitAnd" -> "t", "bitOr" -> "t", "bitXor" -> "t", "bitNot" -> "t",
    "bitShiftLeft" -> "shiftleft", "bitShiftRight" -> "shiftright",
    "bitTest" -> "t",
    // null / comparison
    "isNull" -> "isnull", "isNotNull" -> "isnotnull",
    "isNotDistinctFrom" -> "t", "isDistinctFrom" -> "t",
    "ifNotFinite" -> "t", "toNullable" -> "t",
    // type conversion
    "toInt8" -> "t", "toInt16" -> "t", "toUInt8" -> "t", "toUInt16" -> "t",
    "toUInt32" -> "t", "toUInt64" -> "t", "toFloat32" -> "t",
    "toInt8OrNull" -> "t", "toInt16OrNull" -> "t",
    "toInt32OrNull" -> "t",
    "toInt8OrZero" -> "t", "toInt16OrZero" -> "t", "toInt32OrZero" -> "t",
    "toUInt8OrNull" -> "t", "toUInt16OrNull" -> "t", "toUInt32OrNull" -> "t",
    "toUInt64OrNull" -> "t",
    "toUInt8OrZero" -> "t", "toUInt16OrZero" -> "t", "toUInt32OrZero" -> "t",
    "toUInt64OrZero" -> "t",
    "toFloat32OrNull" -> "t", "toFloat32OrZero" -> "t",
    "toFloat64OrNull" -> "t", "toFloat64OrZero" -> "t",
    "toInt32OrDefault" -> "t", "toInt64OrDefault" -> "t",
    "toUInt64OrDefault" -> "t", "toFloat64OrDefault" -> "t",
    "toDateOrNull" -> "t",
    "toTypeName" -> "ch_type_name",
    // aggregates
    "boolAnd" -> "bool_and", "boolOr" -> "bool_or",
    "groupBitAnd" -> "bit_and", "groupBitOr" -> "bit_or",
    "groupBitXor" -> "bit_xor", "sumKahan" -> "sum",
    "stddevPopStable" -> "stddev_pop", "varPopStable" -> "var_pop",
    "groupArrayArray" -> "t",
    // ids / random
    "generateUUIDv4" -> "uuid", "generateUUIDv7" -> "generate_uuid_v7",
    "generateSnowflakeID" -> "generate_snowflake_id",
    "rand" -> "t", "rand64" -> "t", "randCanonical" -> "t",
    "randUniform" -> "t", "randNormal" -> "t",
    "randExponential" -> "t", "randChiSquared" -> "t", "randStudentT" -> "t",
    "randFisherF" -> "t", "randBernoulli" -> "t", "randBinomial" -> "t",
    "randNegativeBinomial" -> "t", "randPoisson" -> "t", "randLogNormal" -> "t",
    // IP / geo (custom kernels registered via GraftExtensions)
    "IPv4NumToString" -> "t", "IPv4StringToNum" -> "t",
    "IPv6StringToNum" -> "ipv6_string_to_num",
    "IPv6NumToString" -> "ipv6_num_to_string",
    "toIPv6" -> "ipv6_string_to_num",
    "isIPv4String" -> "t", "isIPv6String" -> "t",
    "geohashEncode" -> "geohash_encode", "geohashDecode" -> "geohash_decode",
    "geohashesInBox" -> "geohashes_in_box", "geohashKRing" -> "geohash_kring",
    "stem" -> "t", // template: CH stem('en', s) takes the language FIRST
    // NLP classification (dictionary-backed kernels — llm.Nlp)
    "lemmatize" -> "t", "synonyms" -> "t",
    "detectTonality" -> "t", "detectProgrammingLanguage" -> "t",
    "detectCharset" -> "detect_charset",
    "normalizeQuery" -> "normalize_query",
    "normalizeQueryKeepNames" -> "normalize_query",
    "normalizedQueryHash" -> "normalized_query_hash",
    "normalizedQueryHashKeepNames" -> "normalized_query_hash",
    // misc
    "currentDatabase" -> "current_database", "currentUser" -> "current_user",
    "version" -> "version", "materialize" -> "t", "identity" -> "t",
    "now64" -> "t", "runningAccumulate" -> "t",
    "firstSignificantSubdomain" -> "t", "cutToFirstSignificantSubdomain" -> "t",
    "dictGet" -> "t", "dictGetOrDefault" -> "t",
    "wkt" -> "t", "svg" -> "t", "readWKTPolygon" -> "t",
    // ---- batch 13 ----
    "detectLanguage" -> "detect_language",
    "detectLanguageMixed" -> "detect_language_mixed",
    "detectLanguageUnknown" -> "detect_language",
    "normalizeUTF8NFC" -> "t", "normalizeUTF8NFD" -> "t",
    "normalizeUTF8NFKC" -> "t", "normalizeUTF8NFKD" -> "t",
    "makeDateTime" -> "t", "makeDateTime64" -> "t",
    "parseDateTime" -> "t", "parseDateTimeInJodaSyntax" -> "t",
    "formatDateTimeInJodaSyntax" -> "t", "YYYYMMDDhhmmssToDateTime" -> "t",
    "dateTrunc" -> "date_trunc",
    "fromUTCTimestamp" -> "from_utc_timestamp",
    "toUTCTimestamp" -> "to_utc_timestamp",
    "UTCTimestamp" -> "t",
    "hasSubstr" -> "t", "ngrams" -> "t",
    "arrayFirstOrNull" -> "t", "arrayLastOrNull" -> "t",
    "arrayFill" -> "t", "arrayReverseFill" -> "t",
    "arrayShuffle" -> "shuffle", "arrayRandomSample" -> "t",
    "arrayCumSumNonNegative" -> "t",
    "mapContainsKey" -> "map_contains_key", "mapContainsValue" -> "t",
    "mapSort" -> "t", "mapReverseSort" -> "t", "mapExtractKeyLike" -> "t",
    "IPv4ToIPv6" -> "t", "IPv4CIDRToRange" -> "t",
    "MACStringToNum" -> "t", "MACNumToString" -> "t", "MACStringToOUI" -> "t",
    "cutURLParameter" -> "t", "extractURLParameterNames" -> "t",
    "encodeURLFormComponent" -> "url_encode",
    "decodeURLFormComponent" -> "url_decode",
    "neighbor" -> "t", "positiveModulo" -> "pmod", "positive_modulo" -> "pmod",
    "intDivOrNull" -> "t", "modOrNull" -> "t", "divideOrNull" -> "t",
    "multiplyDecimal" -> "t", "divideDecimal" -> "t",
    // CRC32IEEE now maps to the faithful init-0 kernel above (HashCompat)
    "randomPrintableASCII" -> "t", "randomString" -> "t",
    // ---- batch 14 ----
    "jumpConsistentHash" -> "jump_consistent_hash",
    "greatCircleDistance" -> "t", "geoDistance" -> "t", "greatCircleAngle" -> "t",
    "pointInEllipses" -> "t",
    "bitmaskToArray" -> "t", "bitPositionsToArray" -> "t", "bitmaskToList" -> "t",
    "proportionsZTest" -> "t",
    "formatReadableTimeDelta" -> "t",
    "URLHierarchy" -> "t", "URLPathHierarchy" -> "t",
    // ---- batch 15 ----
    "multiSearchAllPositions" -> "t",
    "multiSearchAllPositionsCaseInsensitive" -> "t",
    "arraySplit" -> "t", "arrayReverseSplit" -> "t",
    "parseReadableSize" -> "t", "parseReadableSizeOrZero" -> "t",
    // ---- batch 3 ----
    // NOTE: no toWeek alias — CH default mode 0 is Sunday-first 0..53,
    // which weekofyear (ISO) would silently misnumber; toISOWeek covers
    // the ISO form.
    "toStartOfSecond" -> "t", "age" -> "t", "timeDiff" -> "t",
    "nowInBlock" -> "current_timestamp",
    "timezone" -> "t", "serverTimezone" -> "t",
    "fromUnixTimestamp64Micro" -> "timestamp_micros",
    "fromUnixTimestamp64Nano" -> "t",
    "toUnixTimestamp64Micro" -> "unix_micros", "toUnixTimestamp64Nano" -> "t",
    "dateName" -> "t",
    "startsWithUTF8" -> "t", "endsWithUTF8" -> "t",
    "leftUTF8" -> "left", "rightUTF8" -> "right",
    "substringIndexUTF8" -> "substring_index",
    "countSubstringsCaseInsensitive" -> "t",
    "notLike" -> "t", "notILike" -> "t",
    "zeroIfNull" -> "t", "nullIfZero" -> "t",
    "intDivOrZero" -> "t", "moduloOrZero" -> "t", "negate" -> "t",
    "toDecimal32" -> "t", "toDecimal64" -> "t", "toDecimal128" -> "t",
    "mapConcat" -> "map_concat",
    "transform" -> "t", // 4-arg value-remap form; 2-arg HOF passes through
    "arrayResize" -> "t", "arrayFlatten" -> "flatten",
    "bitTestAll" -> "t", "bitTestAny" -> "t",
    // ---- batch 4 ----
    // identity names (CH and Spark agree exactly)
    "repeat" -> "repeat", "space" -> "space", "soundex" -> "soundex",
    "ascii" -> "ascii", "left" -> "left", "right" -> "right",
    "ilike" -> "ilike", "degrees" -> "degrees", "radians" -> "radians",
    "sign" -> "sign",
    "toValidUTF8" -> "make_valid_utf8",
    "sumWithOverflow" -> "sum", "corrStable" -> "corr",
    "covarPopStable" -> "covar_pop",
    // templated (call-convention or semantics restructuring)
    "char" -> "t", // CH char(c1, c2, …) concatenates code points
    "mapFilter" -> "t", "mapExists" -> "t", // CH map HOFs take lambda FIRST
    "mapAdd" -> "t", "mapSubtract" -> "t",
    "clamp" -> "t",
    "addQuarters" -> "t", "subtractQuarters" -> "t",
    "addMilliseconds" -> "t", "subtractMilliseconds" -> "t",
    "toRelativeHourNum" -> "t", "toRelativeMinuteNum" -> "t",
    "toRelativeSecondNum" -> "t", "toTime" -> "t",
    "toIntervalSecond" -> "t", "toIntervalMinute" -> "t",
    "toIntervalHour" -> "t", "toIntervalDay" -> "t", "toIntervalWeek" -> "t",
    "toIntervalMonth" -> "t", "toIntervalQuarter" -> "t", "toIntervalYear" -> "t",
    "bitRotateLeft" -> "t", "bitRotateRight" -> "t",
    "arrayRotateLeft" -> "t", "arrayRotateRight" -> "t", "arrayShingles" -> "t",
    "simpleJSONExtractString" -> "t", "simpleJSONExtractInt" -> "t",
    "simpleJSONHas" -> "t",
    "port" -> "t", "cutFragment" -> "t", "cutWWW" -> "t",
    "quantileTDigest" -> "t", "quantileBFloat16" -> "t",
    "quantileTiming" -> "t", "quantilesExact" -> "t", "quantiles" -> "t",
    // vector distances (reference src/Functions/array/arrayDistance.cpp;
    // cosine_sim/dot_product are the graft codegen kernels)
    "arrayDotProduct" -> "t", "dotProduct" -> "t",
    "cosineDistance" -> "t", "arrayCosineDistance" -> "t",
    "L1Distance" -> "t", "L2Distance" -> "t", "L2SquaredDistance" -> "t",
    "LinfDistance" -> "t", "L1Norm" -> "t", "L2Norm" -> "t",
    "arrayJaccardIndex" -> "t",
    // ---- batch 5 ----
    "mapApply" -> "t", "mapUpdate" -> "t", "mapPopulateSeries" -> "t",
    "arrayDifference" -> "t", "arrayEnumerateDense" -> "t",
    "arrayReduce" -> "t",
    "toStartOfDay" -> "t", "toStartOfHour" -> "t", "toStartOfWeek" -> "t",
    "toStartOfQuarter" -> "t", "toStartOfYear" -> "t",
    "tupleElement" -> "t", "tuple" -> "struct", "e" -> "t", "untuple" -> "t",
    "netloc" -> "t", "queryStringAndFragment" -> "t",
    "cutQueryStringAndFragment" -> "t", "extractURLParameters" -> "t",
    "regexpQuoteMeta" -> "t", "roundDuration" -> "t", "roundAge" -> "t",
    // ---- batch 6 ----
    "visitParamExtractString" -> "t", "visitParamExtractInt" -> "t",
    "visitParamHas" -> "t",
    "toDate" -> "t", "toYYYYMMDDhhmmss" -> "t", "timeSlots" -> "t",
    "arrayAUC" -> "t", "range" -> "t",
    "minus" -> "t", "multiply" -> "t", "negate" -> "t",
    "isZeroOrNull" -> "t", "ignore" -> "t",
    "formatReadableSize" -> "t", "formatReadableQuantity" -> "t",
    "formatReadableDecimalSize" -> "t",
    "emptyArrayUInt8" -> "t", "emptyArrayInt64" -> "t",
    "emptyArrayFloat64" -> "t", "emptyArrayString" -> "t",
    "emptyArrayDate" -> "t",
    // identity names (CH and Spark agree exactly)
    "abs" -> "abs", "greatest" -> "greatest", "least" -> "least",
    // ---- batch 7: aggregate-combinator tail ----
    // -OrNull variants return NULL on empty input — which IS Spark's
    // default aggregate behavior, so they map 1:1
    "sumOrNull" -> "sum", "minOrNull" -> "min", "maxOrNull" -> "max",
    "avgOrNull" -> "avg",
    "sumCount" -> "t", "uniqCombined64" -> "t", "quantileGK" -> "t",
    // ---- batch 8: integer math, space-filling curves, JSON tail ----
    // gcd/lcm and the curve codecs are custom kernels registered as SQL
    // functions in GraftFunctions (snake_case names)
    "gcd" -> "gcd", "lcm" -> "lcm",
    "mortonEncode" -> "morton_encode", "mortonDecode" -> "morton_decode",
    "hilbertEncode" -> "hilbert_encode", "hilbertDecode" -> "hilbert_decode",
    "JSONExtractKeys" -> "t", "JSONLength" -> "t", "JSONType" -> "t",
    "JSONExtractArrayRaw" -> "t",
    // base58 / IDNA codecs (custom kernels, snake_case SQL names)
    "base58Encode" -> "base58_encode", "base58Decode" -> "base58_decode_strict",
    "base32Encode" -> "base32_encode", "base32Decode" -> "base32_decode_strict",
    "bech32Encode" -> "bech32_encode", "bech32Decode" -> "bech32_decode",
    "sparseGrams" -> "sparse_grams",
    "tryBase58Decode" -> "base58_decode",
    "idnaEncode" -> "idna_encode", "idnaDecode" -> "idna_decode",
    "tryIdnaEncode" -> "idna_encode",
    // CH window-function spellings (Spark lag/lead are frame-bound)
    "lagInFrame" -> "lag", "leadInFrame" -> "lead",
    // ---- batch 9: bitmap family over sorted-distinct arrays ----
    "bitmapBuild" -> "t", "bitmapToArray" -> "t", "bitmapCardinality" -> "t",
    "bitmapMin" -> "t", "bitmapMax" -> "t",
    "bitmapAnd" -> "t", "bitmapOr" -> "t", "bitmapXor" -> "t",
    "bitmapAndnot" -> "t", "bitmapContains" -> "t",
    "bitmapHasAny" -> "t", "bitmapHasAll" -> "t",
    "bitmapAndCardinality" -> "t", "bitmapOrCardinality" -> "t",
    "bitmapXorCardinality" -> "t", "bitmapAndnotCardinality" -> "t",
    "groupBitmap" -> "t",
    "arrayFold" -> "t", "arrayPartialSort" -> "t",
    "arraySymmetricDifference" -> "t", "arrayEnumerateUniq" -> "t",
    // ---- batch 10: subsequence/groups/shifts, HTML text, width bucket ----
    "widthBucket" -> "width_bucket",
    "extractTextFromHTML" -> "extract_text_from_html",
    "hasSubsequence" -> "t", "hasSubsequenceCaseInsensitive" -> "t",
    "extractGroups" -> "t", "arrayShiftLeft" -> "t", "arrayShiftRight" -> "t",
    "toDecimalString" -> "t",
    "sumDistinct" -> "t", "avgDistinct" -> "t", "countDistinct" -> "t",
    "argMinIf" -> "t", "argMaxIf" -> "t",
    "quantileDeterministic" -> "t",
    "uniqTheta" -> "uniq_theta",
    // ---- batch 11: math/date/encoding tail ----
    "byteSwap" -> "byte_swap",
    "toModifiedJulianDay" -> "t", "fromModifiedJulianDay" -> "t",
    "changeYear" -> "t", "changeMonth" -> "t", "changeDay" -> "t",
    "countDigits" -> "t",
    "encodeXMLComponent" -> "t", "decodeXMLComponent" -> "t",
    "base64URLEncode" -> "t", "base64URLDecode" -> "t",
    "bar" -> "t", "extractKeyValuePairs" -> "t",
    // ---- batch 16 (round 9): dialect gap fill ----
    // string
    "splitByAlpha" -> "t", "splitByNonAlpha" -> "t", "splitByRegexp" -> "t",
    "replaceOne" -> "t", "replaceRegexpOne" -> "t",
    "mismatches" -> "byte_hamming_distance",
    "toStringCutToZero" -> "t",
    "stringBytesUniq" -> "string_bytes_uniq",
    "stringBytesEntropy" -> "string_bytes_entropy",
    "countMatchesCaseInsensitive" -> "t",
    "countSubstringsCaseInsensitiveUTF8" -> "t",
    "hasSubsequenceUTF8" -> "t", "hasSubsequenceCaseInsensitiveUTF8" -> "t",
    "editDistanceUTF8" -> "levenshtein", "levenshteinDistanceUTF8" -> "levenshtein",
    "hasTokenOrNull" -> "t", "hasTokenCaseInsensitiveOrNull" -> "t",
    // date/time
    "toISOYear" -> "t", "toLastDayOfWeek" -> "t", "toStartOfFiveMinute" -> "t",
    "toStartOfMillisecond" -> "t", "toStartOfMicrosecond" -> "t",
    "toStartOfNanosecond" -> "t", "toMillisecond" -> "t",
    "toRelativeYearNum" -> "t", "toRelativeQuarterNum" -> "t",
    "toRelativeMonthNum" -> "t", "toRelativeWeekNum" -> "t",
    "toDaysSinceYearZero" -> "t", "fromDaysSinceYearZero" -> "t",
    "fromDaysSinceYearZero32" -> "t",
    "toMonthNumSinceEpoch" -> "t", "toYearNumSinceEpoch" -> "t",
    "addMicroseconds" -> "t", "subtractMicroseconds" -> "t",
    "addNanoseconds" -> "t", "subtractNanoseconds" -> "t",
    "changeHour" -> "t", "changeMinute" -> "t", "changeSecond" -> "t",
    "timestampDiff" -> "t", "timestamp_diff" -> "t",
    "parseDateTimeOrNull" -> "t", "parseDateTimeOrZero" -> "t",
    "parseDateTimeBestEffortOrZero" -> "t",
    "parseDateTime32BestEffort" -> "t", "parseDateTime32BestEffortOrNull" -> "t",
    "parseDateTime32BestEffortOrZero" -> "t",
    // snowflake / ULID / UUID id-time codecs
    "snowflakeToDateTime" -> "t", "snowflakeToDateTime64" -> "t",
    "dateTimeToSnowflake" -> "t", "dateTime64ToSnowflake" -> "t",
    "snowflakeIDToDateTime" -> "t", "snowflakeIDToDateTime64" -> "t",
    "dateTimeToSnowflakeID" -> "t", "dateTime64ToSnowflakeID" -> "t",
    "UUIDv7ToDateTime" -> "t", "ULIDStringToDateTime" -> "t",
    "UUIDStringToNum" -> "t", "UUIDNumToString" -> "t", "UUIDToNum" -> "t",
    // map / array
    "mapContainsKeyLike" -> "t", "mapContainsValueLike" -> "t",
    "mapExtractKeyLike" -> "t", "mapExtractValueLike" -> "t",
    "indexOfAssumeSorted" -> "array_position",
    // vector-alias surface (normL*/distanceL*/scalarProduct = the L*Norm/
    // L*Distance/dotProduct family already templated above)
    "normL1" -> "t", "normL2" -> "t", "normL2Squared" -> "t",
    "normLinf" -> "t", "distanceL1" -> "t", "distanceL2" -> "t",
    "distanceL2Squared" -> "t", "distanceLinf" -> "t",
    "LinfNorm" -> "t", "scalarProduct" -> "t",
    // simpleJSON / visitParam tail
    "simpleJSONExtractBool" -> "t", "simpleJSONExtractFloat" -> "t",
    "simpleJSONExtractUInt" -> "t", "simpleJSONExtractRaw" -> "get_json_object",
    "visitParamExtractBool" -> "t", "visitParamExtractFloat" -> "t",
    "visitParamExtractUInt" -> "t",
    // ngram/wordShingle SimHash + MinHash fingerprints (StringShingles.scala;
    // reference FunctionsStringHash.cpp — exact CRC32C shingle semantics).
    // *UTF8 word-shingle names are the identical kernel in the reference.
    // reinterpretAs* (Reinterpret.scala; Int128/256/UUID targets are a
    // documented gap). The generic reinterpret(x, 'T') is a template.
    // batch 17: A/B sample sizing, normalized Gini, JSON merge patch,
    // raw punycode; extractAllGroups* are templates (literal regex only)
    // uniqTheta set algebra (aggregates.ThetaSetOps). uniqThetaUnion
    // returns a composable state like the reference; Intersect/Not return
    // the estimate directly (our KMV state cannot carry a reduced theta),
    // so finalizeAggregation over them is the identity and over a
    // union/uniqThetaState state is the KMV estimate.
    // batch 18: small date/array tail
    "toWeek" -> "t", "toYearWeek" -> "t", "week" -> "t", "yearweek" -> "t",
    "bitmapSubsetInRange" -> "t", "bitmapSubsetLimit" -> "t",
    "subBitmap" -> "t", "bitmapTransform" -> "t",
    "moduloOrNull" -> "t", "positiveModuloOrNull" -> "t",
    "pmodOrNull" -> "t", "positive_modulo_or_null" -> "t",
    "arrayLastIndex" -> "t", "YYYYMMDDToDate" -> "t", "str_to_date" -> "t",
    "addDate" -> "t", "subDate" -> "t", "time_bucket" -> "t", "date_bin" -> "t",
    "toStartOfISOYear" -> "t", "toWeekOfWeekYear" -> "t", "toWeekYear" -> "t",
    "fromUnixTimestamp64Second" -> "t", "toUnixTimestamp64Second" -> "t",
    "fromUnixTimestamp64Nano" -> "t", "toUnixTimestamp64Nano" -> "t",
    "UTC_timestamp" -> "t", "curdate" -> "t",
    "parseDateTime64" -> "t", "parseDateTime64OrNull" -> "t",
    "parseDateTime64OrZero" -> "t", "parseDateTime64BestEffort" -> "t",
    "parseDateTime64BestEffortOrNull" -> "t",
    "parseDateTime64BestEffortOrZero" -> "t",
    "toDateTime64" -> "t", "toDateTime32" -> "t",
    "uniqThetaUnion" -> "uniq_theta_union",
    "uniqThetaIntersect" -> "uniq_theta_intersect_count",
    "uniqThetaNot" -> "uniq_theta_not_count",
    "uniqThetaState" -> "uniq_theta_state",
    "uniqState" -> "t", "uniqMerge" -> "t", "uniqThetaMerge" -> "t",
    "uniqExactState" -> "t", "uniqExactMerge" -> "t",
    "sumState" -> "t", "sumMerge" -> "t", "minState" -> "t", "minMerge" -> "t",
    "maxState" -> "t", "maxMerge" -> "t", "countState" -> "t",
    "countMerge" -> "t", "avgState" -> "t", "avgMerge" -> "t",
    "groupArrayState" -> "t", "groupArrayMerge" -> "t",
    "finalizeAggregation" -> "uniq_theta_estimate",
    "minSampleSizeContinuous" -> "min_sample_size_continuous",
    "minSampleSizeContinous" -> "min_sample_size_continuous", // reference alias (typo kept)
    "minSampleSizeConversion" -> "min_sample_size_conversion",
    "arrayNormalizedGini" -> "array_normalized_gini",
    "jsonMergePatch" -> "json_merge_patch", "JSONMergePatch" -> "json_merge_patch",
    "punycodeEncode" -> "punycode_encode", "punycodeDecode" -> "punycode_decode",
    "tryPunycodeDecode" -> "try_punycode_decode",
    "extractAllGroupsVertical" -> "t", "extractAllGroupsHorizontal" -> "t",
    "extractAllGroups" -> "t",
    "reinterpretAsUInt8" -> "ch_reinterpret_u8",
    "reinterpretAsUInt16" -> "ch_reinterpret_u16",
    "reinterpretAsUInt32" -> "ch_reinterpret_u32",
    "reinterpretAsUInt64" -> "ch_reinterpret_u64",
    "reinterpretAsInt8" -> "ch_reinterpret_i8",
    "reinterpretAsInt16" -> "ch_reinterpret_i16",
    "reinterpretAsInt32" -> "ch_reinterpret_i32",
    "reinterpretAsInt64" -> "ch_reinterpret_i64",
    "reinterpretAsFloat32" -> "ch_reinterpret_f32",
    "reinterpretAsFloat64" -> "ch_reinterpret_f64",
    "reinterpretAsDate" -> "ch_reinterpret_date",
    "reinterpretAsDateTime" -> "ch_reinterpret_datetime",
    "reinterpretAsString" -> "ch_reinterpret_string",
    "reinterpret" -> "t",
    "ngramSimHash" -> "ch_ngram_simhash",
    "ngramSimHashCaseInsensitive" -> "ch_ngram_simhash_ci",
    "ngramSimHashUTF8" -> "ch_ngram_simhash_utf8",
    "ngramSimHashCaseInsensitiveUTF8" -> "ch_ngram_simhash_ci_utf8",
    "wordShingleSimHash" -> "ch_wordshingle_simhash",
    "wordShingleSimHashCaseInsensitive" -> "ch_wordshingle_simhash_ci",
    "wordShingleSimHashUTF8" -> "ch_wordshingle_simhash",
    "wordShingleSimHashCaseInsensitiveUTF8" -> "ch_wordshingle_simhash_ci",
    "ngramMinHash" -> "ch_ngram_minhash",
    "ngramMinHashCaseInsensitive" -> "ch_ngram_minhash_ci",
    "ngramMinHashUTF8" -> "ch_ngram_minhash_utf8",
    "ngramMinHashCaseInsensitiveUTF8" -> "ch_ngram_minhash_ci_utf8",
    "wordShingleMinHash" -> "ch_wordshingle_minhash",
    "wordShingleMinHashCaseInsensitive" -> "ch_wordshingle_minhash_ci",
    "wordShingleMinHashUTF8" -> "ch_wordshingle_minhash",
    "wordShingleMinHashCaseInsensitiveUTF8" -> "ch_wordshingle_minhash_ci",
    "ngramMinHashArg" -> "ch_ngram_minhash_arg",
    "ngramMinHashArgCaseInsensitive" -> "ch_ngram_minhash_arg_ci",
    "ngramMinHashArgUTF8" -> "ch_ngram_minhash_arg_utf8",
    "ngramMinHashArgCaseInsensitiveUTF8" -> "ch_ngram_minhash_arg_ci_utf8",
    "wordShingleMinHashArg" -> "ch_wordshingle_minhash_arg",
    "wordShingleMinHashArgCaseInsensitive" -> "ch_wordshingle_minhash_arg_ci",
    "wordShingleMinHashArgUTF8" -> "ch_wordshingle_minhash_arg",
    "wordShingleMinHashArgCaseInsensitiveUTF8" -> "ch_wordshingle_minhash_arg_ci",

    // ---- round-10 batch 19: conversion tail + functional operator forms
    // (reference src/Functions/FunctionsConversion.h remaining spellings;
    // FunctionsComparison.cpp / FunctionsLogical.cpp operator functions) ----
    "toInt8OrDefault" -> "t", "toInt16OrDefault" -> "t",
    "toUInt8OrDefault" -> "t", "toUInt16OrDefault" -> "t",
    "toUInt32OrDefault" -> "t", "toFloat32OrDefault" -> "t",
    "toDateOrZero" -> "t", "toDateOrDefault" -> "t",
    "toDate32OrNull" -> "t", "toDate32OrZero" -> "t", "toDate32OrDefault" -> "t",
    "toDateTimeOrZero" -> "t", "toDateTimeOrDefault" -> "t",
    "toDateTime64OrNull" -> "t", "toDateTime64OrZero" -> "t",
    "toDateTime64OrDefault" -> "t",
    "toUUID" -> "t", "toUUIDOrNull" -> "t", "toUUIDOrZero" -> "t",
    "toUUIDOrDefault" -> "t",
    "toIPv4" -> "t", "toIPv4OrNull" -> "t", "toIPv4OrZero" -> "t",
    "toIPv4OrDefault" -> "t",
    "toIPv6" -> "t", "toIPv6OrNull" -> "t", "toIPv6OrZero" -> "t",
    "toIPv6OrDefault" -> "t",
    "toBool" -> "t", "toFixedString" -> "t",
    "toDecimal32OrNull" -> "t", "toDecimal32OrZero" -> "t",
    "toDecimal32OrDefault" -> "t",
    "toDecimal64OrNull" -> "t", "toDecimal64OrZero" -> "t",
    "toDecimal64OrDefault" -> "t",
    "toDecimal128OrNull" -> "t", "toDecimal128OrZero" -> "t",
    "toDecimal128OrDefault" -> "t",
    "toDecimal256" -> "t", "toDecimal256OrNull" -> "t",
    "toDecimal256OrZero" -> "t", "toDecimal256OrDefault" -> "t",
    "toInt128" -> "t", "toInt128OrNull" -> "t", "toInt128OrZero" -> "t",
    "toInt128OrDefault" -> "t",
    "toInt256" -> "t", "toInt256OrNull" -> "t", "toInt256OrZero" -> "t",
    "toInt256OrDefault" -> "t",
    "toUInt128" -> "t", "toUInt128OrNull" -> "t", "toUInt128OrZero" -> "t",
    "toUInt128OrDefault" -> "t",
    "toUInt256" -> "t", "toUInt256OrNull" -> "t", "toUInt256OrZero" -> "t",
    "toUInt256OrDefault" -> "t",
    "accurateCast" -> "t", "accurateCastOrNull" -> "t",
    "accurateCastOrDefault" -> "t",
    "toLowCardinality" -> "t", "toTimeZone" -> "t", "toTimezone" -> "t",
    "timeZone" -> "t", "serverTimeZone" -> "t",
    "timeZoneOf" -> "t", "timezoneOf" -> "t",
    "timeZoneOffset" -> "t", "timezoneOffset" -> "t",
    "toModifiedJulianDayOrNull" -> "t", "fromModifiedJulianDayOrNull" -> "t",
    "concatWithSeparatorAssumeInjective" -> "concat_ws",
    "equals" -> "t", "notEquals" -> "t", "less" -> "t", "greater" -> "t",
    "lessOrEquals" -> "t", "greaterOrEquals" -> "t",
    "and" -> "t", "or" -> "t", "not" -> "t", "xor" -> "t",

    // ---- round-10 batch 20: search-family tail ----
    "multiSearchAnyUTF8" -> "t", "multiSearchAnyCaseInsensitiveUTF8" -> "t",
    "multiSearchFirstIndexUTF8" -> "t",
    "multiSearchFirstIndexCaseInsensitive" -> "t",
    "multiSearchFirstIndexCaseInsensitiveUTF8" -> "t",
    "multiSearchFirstPositionUTF8" -> "t",
    "multiSearchFirstPositionCaseInsensitive" -> "t",
    "multiSearchFirstPositionCaseInsensitiveUTF8" -> "t",
    "multiSearchAllPositionsUTF8" -> "t",
    "multiSearchAllPositionsCaseInsensitiveUTF8" -> "t",
    "ngramDistanceUTF8" -> "t", "ngramDistanceCaseInsensitive" -> "t",
    "ngramDistanceCaseInsensitiveUTF8" -> "t",
    "ngramSearchUTF8" -> "t", "ngramSearchCaseInsensitive" -> "t",
    "ngramSearchCaseInsensitiveUTF8" -> "t",
    "multiMatchAllIndices" -> "t",
    "multiFuzzyMatchAny" -> "t", "multiFuzzyMatchAnyIndex" -> "t",
    "multiFuzzyMatchAllIndices" -> "t",
    "compareSubstrings" -> "t", "decodeHTMLComponent" -> "t",
    "stringJaccardIndexUTF8" -> "t",
    "byteSlice" -> "t", "bitSlice" -> "t",
    "bin" -> "t", "unbin" -> "t",

    // ---- round-10 batch 21: tuple/vector arithmetic + array tail ----
    "tuplePlus" -> "t", "tupleMinus" -> "t", "tupleMultiply" -> "t",
    "tupleDivide" -> "t", "tupleModulo" -> "t", "tupleIntDiv" -> "t",
    "tupleIntDivOrZero" -> "t", "tupleNegate" -> "t",
    "tuplePlusByNumber" -> "t", "tupleMinusByNumber" -> "t",
    "tupleMultiplyByNumber" -> "t", "tupleDivideByNumber" -> "t",
    "tupleModuloByNumber" -> "t", "tupleIntDivByNumber" -> "t",
    "tupleIntDivOrZeroByNumber" -> "t",
    "vectorSum" -> "t", "vectorDifference" -> "t",
    "tupleConcat" -> "t", "tupleNames" -> "t",
    "tupleToNameValuePairs" -> "t", "tupleHammingDistance" -> "t",
    "flattenTuple" -> "t",
    "addTupleOfIntervals" -> "t", "subtractTupleOfIntervals" -> "t",
    "arrayPRAUC" -> "t", "arrayAUCPR" -> "t",
    "emptyArrayToSingle" -> "t", "arrayPartialShuffle" -> "t",
    "arrayPartialReverseSort" -> "t",
    "arrayEnumerateUniqRanked" -> "t", "arrayEnumerateDenseRanked" -> "t",
    "arrayReduceInRanges" -> "t",
    "LpNorm" -> "t", "normLp" -> "t", "LpDistance" -> "t", "distanceLp" -> "t",
    "normalizeL1" -> "t", "normalizeL2" -> "t", "normalizeLinf" -> "t",
    "normalizeLp" -> "t",
    "mapAll" -> "t", "mapPartialSort" -> "t", "mapPartialReverseSort" -> "t",
    "moduloLegacy" -> "mod",

    // ---- round-10 batch 22: URL RFC/Custom tail + context constants ----
    "domainRFC" -> "t", "domainWithoutWWWRFC" -> "t",
    "topLevelDomainRFC" -> "t", "portRFC" -> "t",
    "firstSignificantSubdomainRFC" -> "t",
    "firstSignificantSubdomainCustom" -> "t",
    "firstSignificantSubdomainCustomRFC" -> "t",
    "cutToFirstSignificantSubdomainRFC" -> "t",
    "cutToFirstSignificantSubdomainWithWWW" -> "t",
    "cutToFirstSignificantSubdomainWithWWWRFC" -> "t",
    "cutToFirstSignificantSubdomainCustom" -> "t",
    "cutToFirstSignificantSubdomainCustomRFC" -> "t",
    "cutToFirstSignificantSubdomainCustomWithWWW" -> "t",
    "cutToFirstSignificantSubdomainCustomWithWWWRFC" -> "t",
    "hostName" -> "t", "hostname" -> "t", "displayName" -> "t",
    "FQDN" -> "t", "fullHostName" -> "t", "uptime" -> "t",
    "queryID" -> "t", "currentQueryID" -> "t", "query_id" -> "t",
    "initialQueryID" -> "t", "initial_query_id" -> "t",
    "tcpPort" -> "t", "shardNum" -> "t", "shardCount" -> "t",
    "serverUUID" -> "t", "connectionId" -> "t", "connection_id" -> "t",
    "DATABASE" -> "t", "SCHEMA" -> "t", "currentSchemas" -> "t",
    "user" -> "t",
    "blockNumber" -> "t", "blockSize" -> "t",
    "rowNumberInBlock" -> "t", "rowNumberInAllBlocks" -> "t",
    "visibleWidth" -> "t", "byteSize" -> "t",
    "throwIf" -> "t", "indexHint" -> "t",
    "isNullable" -> "t", "isConstant" -> "t",
    "defaultValueOfArgumentType" -> "t", "defaultValueOfTypeName" -> "t",
    "toColumnTypeName" -> "t", "dumpColumnStructure" -> "t",
    "isIPAddressInRange" -> "t", "parseTimeDelta" -> "t",
    "isDecimalOverflow" -> "t",
    "runningDifference" -> "t", "runningDifferenceStartingWithFirstValue" -> "t",
    "sipHash64Keyed" -> "t", "sipHash128Keyed" -> "t",
    "sipHash128ReferenceKeyed" -> "t",
    "timestamp" -> "t",

    // ---- round-10 batch 23: digests, consistent hash, random tail ----
    "MD4" -> "ch_md4", "RIPEMD160" -> "ch_ripemd160",
    "keccak256" -> "ch_keccak256", "BLAKE3" -> "ch_blake3",
    "SHA512_256" -> "ch_sha512_256",
    "kostikConsistentHash" -> "kostik_consistent_hash",
    "yandexConsistentHash" -> "kostik_consistent_hash",
    "generateULID" -> "generate_ulid",
    "generateSerialID" -> "generate_serial_id",
    "fuzzBits" -> "fuzz_bits",
    "URLHash" -> "t", "rand32" -> "t", "randConstant" -> "t",
    "randomFixedString" -> "t", "randomStringUTF8" -> "t",

    // ---- round-10 batch 24: dict/parse/window-view tail ----
    "dictGetString" -> "t", "dictGetInt8" -> "t", "dictGetInt16" -> "t",
    "dictGetInt32" -> "t", "dictGetInt64" -> "t", "dictGetUInt8" -> "t",
    "dictGetUInt16" -> "t", "dictGetUInt32" -> "t", "dictGetUInt64" -> "t",
    "dictGetFloat32" -> "t", "dictGetFloat64" -> "t", "dictGetDate" -> "t",
    "dictGetDateTime" -> "t", "dictGetUUID" -> "t", "dictGetIPv4" -> "t",
    "dictGetIPv6" -> "t",
    "dictGetStringOrDefault" -> "t", "dictGetInt8OrDefault" -> "t",
    "dictGetInt16OrDefault" -> "t", "dictGetInt32OrDefault" -> "t",
    "dictGetInt64OrDefault" -> "t", "dictGetUInt8OrDefault" -> "t",
    "dictGetUInt16OrDefault" -> "t", "dictGetUInt32OrDefault" -> "t",
    "dictGetUInt64OrDefault" -> "t", "dictGetFloat32OrDefault" -> "t",
    "dictGetFloat64OrDefault" -> "t", "dictGetDateOrDefault" -> "t",
    "dictGetDateTimeOrDefault" -> "t", "dictGetUUIDOrDefault" -> "t",
    "dictGetIPv4OrDefault" -> "t", "dictGetIPv6OrDefault" -> "t",
    "dictGetOrNull" -> "t", "dictHas" -> "t",
    "parseDateTimeBestEffortUS" -> "t", "parseDateTimeBestEffortUSOrNull" -> "t",
    "parseDateTimeBestEffortUSOrZero" -> "t",
    "parseDateTime64BestEffortUS" -> "t", "parseDateTime64BestEffortUSOrNull" -> "t",
    "parseDateTime64BestEffortUSOrZero" -> "t",
    "parseDateTimeInJodaSyntaxOrNull" -> "t", "parseDateTimeInJodaSyntaxOrZero" -> "t",
    "parseDateTime64InJodaSyntax" -> "t", "parseDateTime64InJodaSyntaxOrNull" -> "t",
    "parseDateTime64InJodaSyntaxOrZero" -> "t",
    "parseReadableSizeOrNull" -> "t", "toInterval" -> "t",
    "toBFloat16" -> "t", "toBFloat16OrNull" -> "t", "toBFloat16OrZero" -> "t",
    "tryBase64Decode" -> "t", "tryBase64URLDecode" -> "t",
    "tryBase32Decode" -> "base32_decode",
    "tumble" -> "t", "tumbleStart" -> "t", "tumbleEnd" -> "t",
    "hop" -> "t", "hopStart" -> "t", "hopEnd" -> "t", "windowID" -> "t",

    // ---- round-10 batch 25: the real S2 cell-id space ----
    "geoToS2" -> "geo_to_s2", "s2ToGeo" -> "s2_to_geo",
    "s2GetNeighbors" -> "s2_get_neighbors",
    "s2CellsIntersect" -> "s2_cells_intersect",
    "s2CapContains" -> "s2_cap_contains", "s2CapUnion" -> "s2_cap_union",
    "s2RectContains" -> "s2_rect_contains", "s2RectAdd" -> "s2_rect_add",
    "s2RectUnion" -> "s2_rect_union",
    "s2RectIntersection" -> "s2_rect_intersection",

    // ---- round-10 batch 26: MySQL-compat pack + JSON paths + misc ----
    "FORMAT_BYTES" -> "t", "FROM_BASE64" -> "t", "TO_BASE64" -> "t",
    "FROM_DAYS" -> "t", "TO_DAYS" -> "t",
    "FROM_UNIXTIME" -> "t", "TO_UNIXTIME" -> "t",
    "REGEXP_MATCHES" -> "t", "DATE_DIFF" -> "t", "TIMESTAMP_DIFF" -> "t",
    "MILLISECOND" -> "t", "SUBSTRING_INDEX" -> "t",
    "YYYYMMDDhhmmssToDateTime64" -> "t",
    "JSONAllPaths" -> "t", "JSONAllPathsWithTypes" -> "t",
    "getSubcolumn" -> "t",
    "initialQueryStartTime" -> "t", "initial_query_start_time" -> "t",
    "file" -> "t",

    // ---- round-10 batch 27: gamma/charset/IPv6-CIDR/IN-forms tail ----
    "lgamma" -> "ch_lgamma", "tgamma" -> "ch_tgamma",
    "convertCharset" -> "convert_charset",
    "IPv6CIDRToRange" -> "t", "cutIPv6" -> "t",
    "IPv4NumToStringClassC" -> "t",
    "path" -> "t", "pathFull" -> "t", "basename" -> "t",
    "in" -> "t", "notIn" -> "t", "nullIn" -> "t", "notNullIn" -> "t",
    "globalIn" -> "t", "globalNotIn" -> "t", "globalNullIn" -> "t",
    "globalNotNullIn" -> "t",
    "inIgnoreSet" -> "t", "notInIgnoreSet" -> "t", "nullInIgnoreSet" -> "t",
    "notNullInIgnoreSet" -> "t", "globalInIgnoreSet" -> "t",
    "globalNotInIgnoreSet" -> "t", "globalNullInIgnoreSet" -> "t",
    "globalNotNullInIgnoreSet" -> "t",
    "partitionId" -> "t", "partitionID" -> "t",
    "hasColumnInTable" -> "t",
    "aes_encrypt_mysql" -> "t", "aes_decrypt_mysql" -> "t",
    "extractKeyValuePairsWithEscaping" -> "t",
    "reinterpretAsUInt128" -> "ch_reinterpret_u128",
    "reinterpretAsInt128" -> "ch_reinterpret_i128",
    "reinterpretAsUInt256" -> "ch_reinterpret_u256",
    "reinterpretAsInt256" -> "ch_reinterpret_i256",
    "reinterpretAsUUID" -> "ch_reinterpret_uuid",
    "reinterpretAsFixedString" -> "ch_reinterpret_fixedstring",

    // ---- round-10 batch 28: hierarchical dictionaries ----
    "dictGetHierarchy" -> "t", "dictIsIn" -> "t",
    "dictGetChildren" -> "t", "dictGetDescendants" -> "t",

    // ---- round-10 batch 29: aggregate spelling tail (reference
    // registerAggregateFunctions.cpp alias surface + the quantile
    // median* spellings of AggregateFunctionQuantile.cpp) ----
    "median" -> "t", "medianTDigest" -> "t", "medianBFloat16" -> "t",
    "medianTiming" -> "t", "medianDeterministic" -> "t",
    "medianTDigestWeighted" -> "t", "medianTimingWeighted" -> "t",
    "medianBFloat16Weighted" -> "t", "medianGK" -> "t", "medianDD" -> "t",
    "medianExactLow" -> "t", "medianExactHigh" -> "t",
    "quantileExactLow" -> "t", "quantileExactHigh" -> "t",
    "medianExactWeighted" -> "t", "quantileExactWeighted" -> "t",
    "medianInterpolatedWeighted" -> "t", "quantileInterpolatedWeighted" -> "t",
    "medianExactWeightedInterpolated" -> "t",
    "quantileExactWeightedInterpolated" -> "t",
    // RESPECT NULLS spellings: Spark first/last default ignoreNulls=false,
    // i.e. they already respect NULLs (the reference's base any/anyLast
    // SKIP NULLs — templated below with ignoreNulls=true)
    "anyRespectNulls" -> "first", "any_respect_nulls" -> "first",
    "anyValueRespectNulls" -> "first", "any_value_respect_nulls" -> "first",
    "anyLastRespectNulls" -> "last", "anyLast_respect_nulls" -> "last",
    "firstValueRespectNulls" -> "first", "first_value_respect_nulls" -> "first",
    "lastValueRespectNulls" -> "last", "last_value_respect_nulls" -> "last",
    "any" -> "t", "anyLast" -> "t", "any_value" -> "t", "anyValue" -> "t",
    "array_agg" -> "collect_list", "array_concat_agg" -> "t",
    "approx_top_k" -> "t", "approx_top_count" -> "t", "approx_top_sum" -> "t",
    "groupArrayLast" -> "t",
    "varSampStable" -> "var_samp", "stddevSampStable" -> "stddev_samp",
    "covarSampStable" -> "covar_samp", "varPopStable" -> "var_pop",
    "stddevPopStable" -> "stddev_pop", "covarPopStable" -> "covar_pop",
    "corrStable" -> "corr",
    "skewSamp" -> "t", "kurtSamp" -> "t", "kurtPop" -> "t",
    "covarPopMatrix" -> "t", "covarSampMatrix" -> "t", "corrMatrix" -> "t",
    "sumMap" -> "t", "minMap" -> "t", "maxMap" -> "t",
    "sumMappedArrays" -> "t", "minMappedArrays" -> "t", "maxMappedArrays" -> "t",
    "sumMapFiltered" -> "t", "sumMapWithOverflow" -> "t",
    "sumMapFilteredWithOverflow" -> "t",
    "groupBitmapXor" -> "t",
    "distinctJSONPaths" -> "t", "distinctJSONPathsAndTypes" -> "t",
    "distinctDynamicTypes" -> "t",

    // ---- round-10 batch 30: scalar/introspection tail ----
    // hyperbolics (reference FunctionMathUnary.h) are Spark built-ins
    "sinh" -> "sinh", "cosh" -> "cosh", "tanh" -> "tanh",
    "asinh" -> "asinh", "acosh" -> "acosh", "atanh" -> "atanh",
    // CH factorial throws for n > 20; Spark's returns NULL (documented)
    "factorial" -> "factorial",
    "fromUnixTimestampInJodaSyntax" -> "t",
    "kql_array_sort_asc" -> "t", "kql_array_sort_desc" -> "t",
    "variantType" -> "t", "variantElement" -> "t",
    "dynamicType" -> "t", "dynamicElement" -> "t",
    "errorCodeToName" -> "error_code_to_name",
    "revision" -> "t", "buildId" -> "t",
    "filesystemAvailable" -> "t", "filesystemCapacity" -> "t",
    "filesystemUnreserved" -> "t",
    "getOSKernelVersion" -> "t",
    "currentProfiles" -> "t", "enabledProfiles" -> "t",
    "defaultProfiles" -> "t",
    "current_schemas" -> "t", "currentSchemas" -> "t",
    "current_query_id" -> "t", "currentQueryID" -> "t",
    "initializeAggregation" -> "t",

    // ---- round-10 batch 31: PromQL-style grid aggregates ----
    "timeSeriesRateToGrid" -> "t", "timeSeriesDeltaToGrid" -> "t",
    "timeSeriesInstantRateToGrid" -> "t",
    "timeSeriesInstantDeltaToGrid" -> "t",
    "timeSeriesResampleToGridWithStaleness" -> "t",
    "timeSeriesLastTwoSamples" -> "t",

    // ---- round-10 batch 32: embedded-geobase region functions ----
    "regionToCity" -> "t", "regionToArea" -> "t", "regionToDistrict" -> "t",
    "regionToCountry" -> "t", "regionToContinent" -> "t",
    "regionToTopContinent" -> "t", "regionToPopulation" -> "t",
    "regionToName" -> "t", "regionIn" -> "t", "regionHierarchy" -> "t",

    // ---- round-10 batch 33: ML methods + sequenceMatchEvents ----
    "stochasticLinearRegression" -> "t",
    "stochasticLinearRegressionState" -> "t",
    "stochasticLogisticRegression" -> "t",
    "stochasticLogisticRegressionState" -> "t",
    "evalMLMethod" -> "t", "sequenceMatchEvents" -> "t",
    "sequenceMatch" -> "t",

    // ---- round-10 batch 34: H3 index arithmetic (H3Cells.scala) ----
    "h3GetResolution" -> "h3_resolution", "h3GetBaseCell" -> "h3_basecell",
    "h3IsValid" -> "h3_isvalid", "h3IsPentagon" -> "h3_ispentagon",
    "h3IsResClassIII" -> "h3_isresclassiii",
    "h3ToString" -> "h3_tostring", "stringToH3" -> "h3_stringto",
    "h3NumHexagons" -> "h3_numhexagons",
    "h3GetPentagonIndexes" -> "h3_pentagonindexes",
    "h3ToParent" -> "h3_toparent", "h3ToCenterChild" -> "h3_tocenterchild",
    "h3ToChildren" -> "h3_tochildren",
    "h3GetRes0Indexes" -> "h3_res0_indexes",
    "h3GetOriginIndexFromUnidirectionalEdge" -> "h3_edgeorigin",
    "h3UnidirectionalEdgeIsValid" -> "h3_edgeisvalid",
    "h3GetUnidirectionalEdgesFromHexagon" -> "h3_edgesfromhexagon",

    // ---- round-10 batch 35: sqids + JSON dynamic-path introspection ----
    "sqidEncode" -> "sqid_encode", "sqidDecode" -> "sqid_decode",
    "sqid" -> "sqid_encode",
    // our JSON model keeps every path dynamic (no shared-data demotion),
    // so DynamicPaths = AllPaths and SharedDataPaths = [] — the
    // max_dynamic_paths storage knob has no analog here (documented)
    "JSONDynamicPaths" -> "t", "JSONDynamicPathsWithTypes" -> "t",
    "JSONSharedDataPaths" -> "t", "JSONSharedDataPathsWithTypes" -> "t",
    "isDynamicElementInSharedData" -> "t",
    "globalVariable" -> "t",
    // lowCardinality dictionary probes: our LowCardinality is a no-op
    // encoding, so keys = the values themselves (indices — a per-block
    // physical position — has no deterministic distributed analog and
    // stays out of scope, documented)
    "lowCardinalityKeys" -> "t",
    // aggThrow(p): the reference's fault-injection test aggregate
    "aggThrow" -> "t"
  )

  /** Names whose call convention needs restructuring — handled by the
    * rewriteCalls templates in rewrite(), NOT by plain alias substitution
    * (the map above keeps them for surface inventory; value "t" = template). */
  private val templated: Set[String] = Set(
    "splitByChar", "multiIf", "avgWeighted", "arrayUniq", "bitHammingDistance",
    "uniqExact", "quantileExact", "arrayStringConcat", "topK", "arrayCumSum",
    "toDayOfWeek", "positionCaseInsensitive", "dateDiff", "date_diff") ++
    aliases.collect { case (k, "t") => k }

  /** CH JSON functions address by KEY NAME (variadic: each further
    * argument descends one level); get_json_object wants a JSONPath —
    * chain every key after '$.' unless the caller already passed a
    * path. Integer arguments are CH 1-based array indexes → [i-1]. */
  private def jsonPath(a: Seq[String]): String = {
    val keys = a.drop(1).map(_.trim)
    if (keys.head.startsWith("'$") && keys.length == 1) keys.head
    else {
      val parts = keys.map { k =>
        if (k.matches("-?\\d+")) s"'[${k.toLong - 1}]'" else s"'.', $k"
      }
      s"concat('$$', ${parts.mkString(", ")})"
    }
  }

  /** Strip surrounding single quotes from a name-valued argument
    * (dictGet-style calls pass table/column names as string literals). */
  private def stripName(s: String): String = s.trim.stripPrefix("'").stripSuffix("'")

  /** detectTonality(x) as SQL text: mean emotional-dictionary weight of
    * matched words rescaled to [-1,1] (positive /6, negative /12 — the
    * dictionary range is -12..6), 0 when nothing matches. Dictionary
    * rendered from llm.Nlp.tonalityDict (one source of truth). */
  private def tonalitySqlExpr(x: String): String = {
    val mapLit = graft.llm.Nlp.tonalityDict
      .map { case (w, v) => s"'$w',$v" }.mkString("map(", ",", ")")
    val ws = s"filter(transform(filter(split(lower($x), '[^a-z0-9]+'), " +
      s"__t -> __t != ''), __t -> element_at($mapLit, __t)), __v -> __v IS NOT NULL)"
    val sum = s"CAST(aggregate($ws, 0L, (__a, __v) -> __a + __v) AS DOUBLE)"
    s"(CASE WHEN size($ws) = 0 THEN CAST(0.0 AS DOUBLE) " +
      s"WHEN $sum > 0 THEN $sum / size($ws) / 6.0 " +
      s"ELSE $sum / size($ws) / 12.0 END)"
  }

  /** detectProgrammingLanguage(x) as SQL text: keyword token hits per
    * profile, max wins (earlier profile on ties), no hits -> 'undefined'.
    * Profiles rendered from llm.Nlp.progKeywords. */
  private def progLangSqlExpr(x: String): String = {
    val toks = s"filter(split(lower($x), '[^a-z0-9]+'), __t -> __t != '')"
    val counts = graft.llm.Nlp.progKeywords.map { case (lang, kws) =>
      lang -> s"size(filter($toks, __t -> __t IN (${kws.map(k => s"'$k'").mkString(",")})))"
    }
    val branches = counts.zipWithIndex.map { case ((lang, c), i) =>
      val later = counts.drop(i + 1).map(_._2)
      val cond = (s"$c > 0" +: later.map(o => s"$c >= $o")).mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString(" ")
    s"(CASE $branches ELSE 'undefined' END)"
  }

  /** Split a function-argument string on top-level commas. */
  private[sqlfront] def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var last = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(last, i); last = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(last)
    out.map(_.trim).toSeq
  }

  /** Find `name(` occurrences (word boundary), rewrite via `f(args)`. */
  private def rewriteCalls(sql: String, name: String)(f: Seq[String] => String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val idx = sql.indexOf(name + "(", i)
      val boundaryOk = idx >= 0 &&
        (idx == 0 || !Character.isLetterOrDigit(sql.charAt(idx - 1)) && sql.charAt(idx - 1) != '_')
      if (idx < 0) { sb.append(sql.substring(i)); i = sql.length }
      else if (!boundaryOk) { sb.append(sql.substring(i, idx + name.length)); i = idx + name.length }
      else {
        sb.append(sql.substring(i, idx))
        // find matching close paren
        var depth = 0; var j = idx + name.length; var end = -1; var inStr = false
        while (j < sql.length && end < 0) {
          val c = sql.charAt(j)
          if (inStr) { if (c == '\'') inStr = false }
          else if (c == '\'') inStr = true
          else if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth == 0) end = j }
          j += 1
        }
        if (end < 0) { sb.append(sql.substring(idx)); i = sql.length }
        else {
          // recurse into the args first: the same name may be NESTED
          // inside its own arguments (splitByChar(' ', …splitByChar…)),
          // and the outer splice would otherwise skip the inner call
          // unrewritten (found by the dialect fuzzer). f's OUTPUT is
          // deliberately not rescanned — templates may emit the Spark
          // name of the function they translate (substring -> substring).
          val args = splitArgs(sql.substring(idx + name.length + 1, end))
            .map(a => rewriteCalls(a, name)(f))
          sb.append(f(args))
          i = end + 1
        }
      }
    }
    sb.toString
  }

  /** Generalized `name(params)(args)` parameterized-aggregate rewriter:
    * BOTH groups are paren-matched (params may be arbitrary expressions —
    * array literals, casts), then f(params, args) is spliced in. A call
    * without a second argument list is left untouched, so the plain
    * single-group form of the same name can be handled afterwards. */
  private def rewriteParamCalls(sql: String, name: String)(
      f: (Seq[String], Seq[String]) => String): String = {
    def closeParen(start: Int): Int = {
      var depth = 0; var j = start; var end = -1; var inStr = false
      while (j < sql.length && end < 0) {
        val c = sql.charAt(j)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) end = j }
        j += 1
      }
      end
    }
    val sb = new StringBuilder
    var i = 0
    var changed = false
    while (i < sql.length) {
      val idx = sql.indexOf(name + "(", i)
      val boundaryOk = idx >= 0 &&
        (idx == 0 || !Character.isLetterOrDigit(sql.charAt(idx - 1)) && sql.charAt(idx - 1) != '_')
      if (idx < 0) { sb.append(sql.substring(i)); i = sql.length }
      else if (!boundaryOk) { sb.append(sql.substring(i, idx + name.length)); i = idx + name.length }
      else {
        val pEnd = closeParen(idx + name.length)
        var k = if (pEnd < 0) -1 else pEnd + 1
        while (k > 0 && k < sql.length && Character.isWhitespace(sql.charAt(k))) k += 1
        if (pEnd < 0 || k < 0 || k >= sql.length || sql.charAt(k) != '(') {
          val stop = if (pEnd < 0) sql.length else pEnd + 1
          sb.append(sql.substring(i, stop)); i = stop
        } else {
          val aEnd = closeParen(k)
          if (aEnd < 0) { sb.append(sql.substring(i)); i = sql.length }
          else {
            sb.append(sql.substring(i, idx))
            val params = splitArgs(sql.substring(idx + name.length + 1, pEnd))
            val args = splitArgs(sql.substring(k + 1, aEnd))
            sb.append(f(params, args))
            changed = true
            i = aEnd + 1
          }
        }
      }
    }
    // params may themselves contain `name(p)(x)` (rare); one more pass
    if (changed && sb.toString.contains(name + "(")) sb.toString match {
      case s2 if s2 != sql => rewriteParamCalls(s2, name)(f)
      case s2 => s2
    } else sb.toString
  }

  private val floatLitRe =
    """(?<![\w.])(\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)(?![\w.])""".r

  /** Suffix bare fractional / exponent numeric literals with `D` (Spark's
    * double-literal marker) outside string literals, so they type as
    * DOUBLE like ClickHouse's Float64 literals instead of Spark's
    * DECIMAL default. */
  private[graft] def rewriteFloatLiterals(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var segStart = 0
    var inStr = false
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        if (!inStr) {
          sb.append(floatLitRe.replaceAllIn(sql.substring(segStart, i), m => m.group(1) + "D"))
          segStart = i
        } else {
          sb.append(sql.substring(segStart, i + 1))
          segStart = i + 1
        }
        inStr = !inStr
      }
      i += 1
    }
    if (inStr) sb.append(sql.substring(segStart))
    else sb.append(floatLitRe.replaceAllIn(sql.substring(segStart), m => m.group(1) + "D"))
    sb.toString
  }

  /** CH array literals `[a, b]` -> `array(a, b)`, leaving subscripts
    * (`expr[1]`) untouched: a bracket is a literal iff the previous
    * non-space char is not an identifier char, ')' or ']'. */
  /** CH map literals `{'k': v, ...}` -> `map('k', v, ...)` (reference
    * src/Parsers/ExpressionElementParsers.cpp ParserMapOfLiterals).
    * Quote-aware; nested maps recurse. `{name:Type}` query-parameter
    * placeholders (identifier key, type-name value, single entry, no
    * quotes) are left alone. */
  private[sqlfront] def rewriteMapLiterals(sql: String): String = {
    if (!sql.contains('{')) return sql
    val sb = new StringBuilder
    var i = 0; var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
      else if (c == '{') {
        var j = i + 1; var depth = 1; var s2 = false
        while (j < sql.length && depth > 0) {
          val ch = sql.charAt(j)
          if (s2) { if (ch == '\'') s2 = false }
          else if (ch == '\'') s2 = true
          else if (ch == '{') depth += 1
          else if (ch == '}') depth -= 1
          j += 1
        }
        if (depth != 0) { sb.append(c); i += 1 }
        else {
          val body = sql.substring(i + 1, j - 1).trim
          if (body.isEmpty) { sb.append("map()"); i = j }
          else if (body.matches("[A-Za-z_]\\w*\\s*:\\s*[A-Za-z_][\\w()]*")) {
            // query-parameter placeholder {name:Type} — not a map literal
            sb.append(sql.substring(i, j)); i = j
          } else {
            // split top-level commas, then each entry at its first
            // top-level colon
            val entries = splitArgs(body)
            val kvs = entries.map { e =>
              var k = 0; var d = 0; var s3 = false; var colon = -1
              while (k < e.length && colon < 0) {
                val ch = e.charAt(k)
                if (s3) { if (ch == '\'') s3 = false }
                else ch match {
                  case '\'' => s3 = true
                  case '(' | '[' | '{' => d += 1
                  case ')' | ']' | '}' => d -= 1
                  case ':' if d == 0 => colon = k
                  case _ =>
                }
                k += 1
              }
              if (colon < 0) null
              else (e.substring(0, colon).trim, e.substring(colon + 1).trim)
            }
            if (kvs.contains(null)) { sb.append(c); i += 1 }
            else {
              // CH keeps duplicate map keys and LOOKUP returns the FIRST
              // match (reference arrayElement.cpp executeMatchKeyToIndex);
              // Spark has no FIRST_WIN dedup policy, so drop later
              // duplicate literal keys here — first-match lookup and
              // insertion-order rendering both come out right
              val firstWin = kvs.foldLeft(Vector.empty[(String, String)]) {
                (acc, kv) => if (acc.exists(_._1 == kv._1)) acc else acc :+ kv
              }
              sb.append("map(").append(firstWin.map { case (k, v) =>
                s"${rewriteMapLiterals(k)}, ${rewriteMapLiterals(v)}"
              }.mkString(", ")).append(")")
              i = j
            }
          }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** C-style ternary `cond ? a : b` -> `if(cond, a, b)` (reference
    * ParserTernaryOperatorExpression). Operand extents are found by
    * walking to the nearest top-level comma / unbalanced paren /
    * clause keyword — the shapes the stateless tests use. `::` casts
    * and quoted strings are skipped. */
  private[sqlfront] def rewriteTernary(sql: String): String = {
    if (!sql.contains('?')) return sql
    // locate the first '?' outside strings
    var qi = -1; var i = 0; var inStr = false
    while (i < sql.length && qi < 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '?') qi = i
      i += 1
    }
    if (qi < 0) return sql
    // matching ':' forward at same depth (nested ternaries stack)
    var j = qi + 1; var depth = 0; var s2 = false; var pend = 0; var ci = -1
    while (j < sql.length && ci < 0) {
      val c = sql.charAt(j)
      if (s2) { if (c == '\'') s2 = false }
      else c match {
        case '\'' => s2 = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case '?' if depth == 0 => pend += 1
        case ':' if depth == 0 && j + 1 < sql.length && sql.charAt(j + 1) == ':' =>
        case ':' if depth == 0 && sql.charAt(j - 1) == ':' =>
        case ':' if depth == 0 => if (pend == 0) ci = j else pend -= 1
        case _ =>
      }
      j += 1
    }
    if (ci < 0) return sql
    // NOTE: no "in"/"not" here — ternary binds loosest (reference
    // ParserTernaryOperatorExpression), so `x IN (1,2) ? a : b` takes
    // the whole membership test as its condition
    val kw = Set("select", "where", "having", "when", "then", "else", "on",
      "by", "as", "and", "or", "union", "all", "settings")
    // cond: walk back from '?'
    var k = qi - 1; var d = 0; var s3 = false; var condStart = 0
    while (k >= 0 && condStart == 0) {
      val c = sql.charAt(k)
      if (s3) { if (c == '\'') s3 = false }
      else c match {
        case '\'' => s3 = true
        case ')' | ']' => d += 1
        case '(' | '[' => if (d == 0) condStart = k + 1 else d -= 1
        case ',' if d == 0 => condStart = k + 1
        // a lambda arrow: the ternary is the lambda BODY — the head
        // (x ->) stays outside the if() (01043 arrayMap shape)
        case '>' if d == 0 && k > 0 && sql.charAt(k - 1) == '-' =>
          condStart = k + 1
        case _ =>
      }
      if (condStart == 0 && d == 0 && (c.isLetter || c == '_')) {
        // a full word — stop after clause keywords
        var w = k
        while (w >= 0 && (sql.charAt(w).isLetterOrDigit || sql.charAt(w) == '_')) w -= 1
        val word = sql.substring(w + 1, k + 1).toLowerCase
        if (kw.contains(word) &&
            (w < 0 || !sql.charAt(w).isLetterOrDigit && sql.charAt(w) != '_'))
          condStart = k + 1
        else k = w + 1
      }
      k -= 1
    }
    // else-branch: walk forward from ':'
    var e = ci + 1; var d2 = 0; var s4 = false; var elseEnd = sql.length
    val tailKw = Set("from", "as", "where", "group", "order", "limit",
      "settings", "union", "having", "format", "then", "else", "end", "when")
    while (e < sql.length && elseEnd == sql.length) {
      val c = sql.charAt(e)
      if (s4) { if (c == '\'') s4 = false }
      else c match {
        case '\'' => s4 = true
        case '(' | '[' => d2 += 1
        case ')' | ']' => if (d2 == 0) elseEnd = e else d2 -= 1
        case ',' if d2 == 0 => elseEnd = e
        case ';' if d2 == 0 => elseEnd = e
        case _ =>
      }
      if (elseEnd == sql.length && d2 == 0 && (c.isLetter || c == '_') &&
          (e == 0 || !sql.charAt(e - 1).isLetterOrDigit && sql.charAt(e - 1) != '_')) {
        var w = e
        while (w < sql.length && (sql.charAt(w).isLetterOrDigit || sql.charAt(w) == '_')) w += 1
        if (tailKw.contains(sql.substring(e, w).toLowerCase)) elseEnd = e
        else e = w - 1
      }
      e += 1
    }
    val cond = sql.substring(condStart, qi).trim
    val thenB = sql.substring(qi + 1, ci).trim
    val elseB = sql.substring(ci + 1, elseEnd).trim
    if (cond.isEmpty || thenB.isEmpty || elseB.isEmpty) return sql
    rewriteTernary(sql.substring(0, condStart) +
      s" if($cond, $thenB, $elseB) " + sql.substring(elseEnd))
  }

  private[sqlfront] def rewriteArrayLiterals(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
      else if (c == '[') {
        // subscript only when the bracket DIRECTLY follows an expression
        // (identifier char, ')' or ']'); whitespace before '[' => literal
        val prev = if (sb.nonEmpty) sb.charAt(sb.length - 1) else ' '
        val isSubscript = Character.isLetterOrDigit(prev) || prev == '_' ||
          prev == ')' || prev == ']' || prev == '}'
        if (isSubscript) {
          // CH subscripts are 1-based; Spark's [] is 0-based. Rewrite
          // `prim[idx]` -> `element_at(prim, idx)` by backtracking to the
          // start of the preceding primary expression.
          var depth = 0; var j = i; var end = -1; var s2 = false
          while (j < sql.length && end < 0) {
            val ch = sql.charAt(j)
            if (s2) { if (ch == '\'') s2 = false }
            else if (ch == '\'') s2 = true
            else if (ch == '[') depth += 1
            else if (ch == ']') { depth -= 1; if (depth == 0) end = j }
            j += 1
          }
          if (end < 0) { sb.append(c); i += 1 }
          else {
            val idx = rewriteArrayLiterals(sql.substring(i + 1, end))
            // backtrack over the primary expression in sb
            var k = sb.length - 1
            def matchBack(open: Char, close: Char): Unit = {
              var d = 0
              while (k >= 0) {
                val ch = sb.charAt(k)
                if (ch == close) d += 1
                else if (ch == open) { d -= 1; if (d == 0) { k -= 1; return } }
                k -= 1
              }
            }
            if (sb.charAt(k) == ')') matchBack('(', ')')
            else if (sb.charAt(k) == ']') matchBack('[', ']')
            else if (sb.charAt(k) == '}') matchBack('{', '}') // map literal
            while (k >= 0 && (Character.isLetterOrDigit(sb.charAt(k)) || sb.charAt(k) == '_' || sb.charAt(k) == '.'))
              k -= 1
            val prim = sb.substring(k + 1)
            sb.setLength(k + 1)
            // ch_element_at: CH out-of-bounds / missing-key access
            // returns the element-type DEFAULT, not NULL
            sb.append("ch_element_at(").append(prim).append(", ").append(idx).append(")")
            i = end + 1
          }
        }
        else {
          // find matching ] at depth 0
          var depth = 0; var j = i; var end = -1; var s2 = false
          while (j < sql.length && end < 0) {
            val ch = sql.charAt(j)
            if (s2) { if (ch == '\'') s2 = false }
            else if (ch == '\'') s2 = true
            else if (ch == '[') depth += 1
            else if (ch == ']') { depth -= 1; if (depth == 0) end = j }
            j += 1
          }
          if (end < 0) { sb.append(c); i += 1 }
          else {
            val innerRewritten = rewriteArrayLiterals(sql.substring(i + 1, end))
            sb.append("array(").append(innerRewritten).append(")")
            i = end + 1
          }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------- SQL lambda UDFs
  // CREATE FUNCTION f AS (x, y) -> expr   (reference:
  // src/Functions/UserDefined/UserDefinedSQLFunctionFactory.cpp). Macros
  // expand textually at rewrite time, BEFORE templates/aliases, so bodies
  // may use the full CH dialect (and other macros, up to depth 10).
  private val createFnPattern = java.util.regex.Pattern.compile(
    """(?is)CREATE\s+FUNCTION\s+(\w+)\s+AS\s*(?:\(([\w\s,]*)\)|(\w+))\s*->\s*(.+?)\s*(?:;|$)""")

  private val registeredFns =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[String], String)]

  /** CREATE DICTIONARY registry: dictionary name -> (source table, key
    * column) — gives dictGet its CH-native 3-argument form (reference
    * declares the key in the dictionary DDL the same way). */
  /** Reset every per-session dialect table/metadata registry and drop
    * the session's temp views — the analog of clickhouse-test giving
    * each stateless test its OWN fresh database. Called by the anchor
    * runner between tests; the fixture views re-register on the next
    * sql() (Tables.registerAll runs per call). Without this, aliases /
    * engine metadata / flattened-Nested names from one test rewrite a
    * LATER test's text (shared-JVM ordering artifacts). */
  def resetSessionState(spark: SparkSession): Unit = {
    registeredDicts.clear(); dictParents.clear()
    tableTtls.clear(); tableDefaults.clear(); tableAliases.clear()
    tableEngines.clear(); tableColTz.clear(); tableColMeta.clear()
    engineBacking.clear(); engineBlockSeq.clear(); joinEngineKeys.clear()
    legacyFormatTables.clear()
    alterVirtualCols.clear(); hiddenInsertCols.clear()
    tableDdlTail.clear(); tableColExtras.clear(); tableIndexes.clear()
    tableProjections.clear(); replicaGroup.clear(); tableSparseRatio.clear()
    ChParts.clear(); virtualShadow.clear(); detachedRows.clear()
    recordedSettings.clear()
    nestedColNames.clear()
    distributedTables.clear(); distributedIntents.clear()
    matViews.clear(); replicaPaths.clear()
    dynamicCols.clear()
    emitTotalsMarker = false
    spark.conf.set("spark.graft.chAggNullForEmpty", "false")
    spark.conf.set("spark.graft.chEmptyResultEmptySet", "false")
    spark.conf.set("spark.graft.jsonEscapeSlash", "true")
    spark.conf.set("spark.graft.jsonQuote64", "true")
    spark.catalog.listTables().collect().map(_.name)
      .foreach(spark.catalog.dropTempView)
    // fixture + generator views were just dropped — force the next
    // sql() to re-register them (their registration is memoized per
    // session since r18; see Tables.registerAll)
    graft.core.Tables.invalidateRegistered(spark)
    sessionViewsReady.remove(spark)
  }

  /** Sessions whose system_numbers/system_one generator views exist —
    * creating them measured ~14 ms/query (DriverOverheadTimer r18), so
    * sqlImpl builds them once per session; resetSessionState drops the
    * views and clears the flag. */
  private val sessionViewsReady =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  private val registeredDicts =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** dictionary name -> parent column, for attributes declared
    * HIERARCHICAL in the CREATE DICTIONARY DDL (round 10). */
  private val dictParents =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** table name -> TTL expression from CREATE TABLE ... TTL <expr>
    * (reference MergeTreeData TTL; rows expire when the expression is in
    * the past). Applied at OPTIMIZE time, like the reference's TTL merges
    * (round 11). */
  private val tableTtls =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** table name -> declared DEFAULT/MATERIALIZED/ALIAS expressions from a
    * bare CREATE TABLE (reference ColumnsDescription defaults): unlisted
    * columns of a subsequent INSERT are computed from these. */
  private val tableDefaults =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, String)]]

  /** CH table names that are not valid unquoted Spark identifiers (the
    * stateless tests name tables `03130_test` etc.): chName -> the safe
    * view name actually registered. Occurrences in later statements are
    * substituted before parsing. */
  private val tableAliases =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** MergeTree engine-family merge metadata recorded at CREATE: family,
    * sort key, and the family parameters (sign / version / summed
    * columns). Merge semantics apply at OPTIMIZE TABLE and under
    * SELECT ... FINAL — the two points where the reference guarantees a
    * merged view (background merges are timing-dependent there and the
    * stateless corpus does not rely on them). */
  private case class EngineMeta(family: String, keys: Seq[String],
      sign: Option[String], version: Option[String], measures: Seq[String])
  private val tableEngines =
    scala.collection.concurrent.TrieMap.empty[String, EngineMeta]

  /** FINAL-merge backing per engine table: the unioned insert blocks
    * with a recorded `__gblock` insert sequence. The reference merges
    * parts in BLOCK-NUMBER order (each INSERT allocates a monotonic
    * block number); monotonically_increasing_id over the unioned view is
    * partition-major, which need not equal insert order once a block has
    * more than one partition — so insert order is recorded HERE at
    * INSERT time instead. Any non-INSERT view replacement (ALTER,
    * mutation, OPTIMIZE, TRUNCATE, DROP) invalidates the backing and
    * FINAL falls back to the view (single merged block). */
  /** (join kind, key columns) of ENGINE = Join tables, for joinGet
    * lookups — joinGet requires a LEFT join table (reference
    * StorageJoin::joinGet: INCOMPATIBLE_TYPE_OF_JOIN otherwise). */
  private val joinEngineKeys =
    scala.collection.concurrent.TrieMap.empty[String, (String, Seq[String])]

  /** Tables created with the DEPRECATED positional MergeTree syntax
    * (ENGINE = MergeTree(date, key, granularity)) — per-table SETTING
    * changes are rejected on them (reference AlterCommands). */
  private val legacyFormatTables: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Recognized MergeTree per-table settings (reference
    * MergeTreeSettings.h) — unknown names error (UNKNOWN_SETTING). */
  private val knownTableSettings: Set[String] = Set(
    "index_granularity", "index_granularity_bytes",
    "enable_mixed_granularity_parts", "min_bytes_for_wide_part",
    "min_rows_for_wide_part", "ttl_only_drop_parts",
    "merge_with_ttl_timeout", "storage_policy", "allow_nullable_key",
    "parts_to_delay_insert", "parts_to_throw_insert", "max_parts_in_total",
    "old_parts_lifetime", "min_merge_bytes_to_use_direct_io",
    "write_final_mark", "merge_max_block_size",
    "max_bytes_to_merge_at_max_space_in_pool",
    "min_age_to_force_merge_seconds", "max_suspicious_broken_parts",
    "vertical_merge_algorithm_min_rows_to_activate",
    "vertical_merge_algorithm_min_columns_to_activate",
    "replicated_deduplication_window",
    "non_replicated_deduplication_window", "max_replicated_merges_in_queue",
    "cleanup_delay_period", "min_bytes_for_full_part_storage",
    "ratio_of_defaults_for_sparse_serialization",
    "min_rows_for_compact_part", "min_bytes_for_compact_part",
    "in_memory_parts_enable_wal", "fsync_after_insert",
    "number_of_free_entries_in_pool_to_lower_max_size_of_merge",
    "always_fetch_merged_part", "prefer_fetch_merged_part_time_threshold",
    "prefer_fetch_merged_part_size_threshold", "max_delay_to_insert",
    "allow_remote_fs_zero_copy_replication", "detach_not_byte_identical_parts",
    "merge_tree_clear_old_temporary_directories_interval_seconds",
    "merge_tree_clear_old_parts_interval_seconds")

  private val engineBacking =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val engineBlockSeq =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Stamp an INSERT block with the table's next block sequence and
    * extend the FINAL backing. Block 0 bootstraps from the pre-insert
    * view (CREATE ... AS SELECT initial data). Call AFTER the public
    * view was re-registered (the global view replacement also clears
    * the backing). */
  private def appendEngineBlock(name: String, preInsert: DataFrame,
                                block: DataFrame): Unit =
    if (tableEngines.contains(name)) {
      import org.apache.spark.sql.functions.lit
      val seq = engineBlockSeq.updateWith(name) {
        case Some(n) => Some(n + 1); case None => Some(1L) }.get
      val base = engineBacking.get(name).filter(
          _.columns.filterNot(_ == "__gblock").sameElements(preInsert.columns))
        .getOrElse(preInsert.withColumn("__gblock", lit(0L)))
      val merged = base.unionByName(block.withColumn("__gblock", lit(seq)))
      // bound the union-lineage depth: every 32 blocks, cut the plan at a
      // materialized localCheckpoint so the Nth INSERT re-analyzes an
      // O(32) tree, not an O(N) one (quadratic total otherwise). Some
      // block plans only evaluate under the read path's rewrites (e.g.
      // unsigned overflow-wrap on t64-style inserts): if eager
      // materialization fails, keep the lazy chain — correctness first.
      engineBacking.put(name,
        if (seq % 32 == 0)
          (try merged.localCheckpoint() catch {
            case e: Throwable =>
              System.err.println(s"[graft] engineBacking checkpoint for " +
                s"'$name' at block $seq fell back to lazy lineage: " +
                Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
              merged
          })
        else merged)
    }

  /** DateTime('tz') columns per table: type-default (epoch) fills render
    * as the declared zone's WALL CLOCK, matching inserted literals. */
  private val tableColTz =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  /** Raw DDL tail (everything after the column list) per bare-created
    * table — SHOW CREATE reconstructs the canonical engine/clause block
    * from it (reference InterpreterShowCreateQuery). */
  private val tableDdlTail =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Declared per-column COMMENT / CODEC / TTL clauses (metadata-only in
    * the reference — ColumnsDescription) per bare-created table:
    * col -> (comment, codec args, ttl expr). Rendered by SHOW CREATE and
    * DESCRIBE; ALTER COMMENT COLUMN updates the comment slot. */
  private val tableColExtras =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, (String, String, String)]]

  /** Declared skip indexes per table, in declaration order:
    * (index name, definition text after the name — e.g.
    * "u64 * i32 TYPE minmax GRANULARITY 10"). The reference keeps these
    * in IndicesDescription and SHOW CREATE re-renders them inside the
    * column block; ALTER ADD/DROP INDEX maintains the list. */
  private val tableIndexes =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(String, String)]]

  /** SHOW CREATE / DESCRIBE render Tuple(...) types one element per line
    * (reference IDataType::getName through formatAST one_line=false):
    * `Tuple(\n<pad>a Int8,\n<pad>b String)` with elements indented 4
    * past the line the type starts on and the closing paren attached to
    * the last element. Other composite types stay single-line. */
  private[sqlfront] def chTypeMultiline(ty: String, baseIndent: Int): String = {
    val t = ty.trim
    val open = t.indexOf('(')
    if (!t.toLowerCase.startsWith("tuple") || open < 0 || !t.endsWith(")")) t
    else {
      val inner = t.substring(open + 1, t.length - 1)
      val elems = splitArgs(inner).map(_.trim).filter(_.nonEmpty)
      if (elems.isEmpty) t
      else {
        val pad = " " * (baseIndent + 4)
        val parts = elems.map { e =>
          // named element = identifier + space at paren-depth 0
          var d = 0; var sp = -1; var k = 0
          while (k < e.length && sp < 0) {
            val c = e.charAt(k)
            if (c == '(') d += 1 else if (c == ')') d -= 1
            else if (c == ' ' && d == 0) sp = k
            k += 1
          }
          if (sp > 0)
            e.take(sp) + " " + chTypeMultiline(e.drop(sp + 1), baseIndent + 4)
          else chTypeMultiline(e, baseIndent + 4)
        }
        t.take(open) + "(\n" + pad + parts.mkString(",\n" + pad) + ")"
      }
    }
  }

  /** Declared projections per table, in order: (name, body text inside
    * the parens). SHOW CREATE re-renders them with the reference's
    * clause-per-line statement formatting. */
  private val tableProjections =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(String, String)]]

  /** Per-table ratio_of_defaults_for_sparse_serialization (CREATE
    * SETTINGS; reference MergeTreeSettings default 0.9375). A part's
    * column serializes Sparse when its default-value ratio is >= this. */
  private val tableSparseRatio =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  /** serialization_kind per (part, column) for system.parts_columns:
    * computed from the virtual-column shadow at query time (test scale;
    * a real deployment reads this from the format's own manifest). */
  private def sparseKindsFor(spark: SparkSession, t: String): Map[(String, String), String] =
    virtualShadow.get(t) match {
      case Some(sh) =>
        import org.apache.spark.sql.functions._
        val ratio = tableSparseRatio.getOrElse(t, 0.9375)
        val defaultTest: Map[String, org.apache.spark.sql.Column] =
          sh.schema.fields.filterNot(_.name.startsWith("_")).flatMap { f =>
            import org.apache.spark.sql.types._
            val c = col(s"`${f.name}`")
            f.dataType match {
              case _: NumericType => Some(f.name -> (c === lit(0)))
              case StringType => Some(f.name -> (c === lit("")))
              case BooleanType => Some(f.name -> (c === lit(false)))
              case _: ArrayType => Some(f.name -> (size(c) === lit(0)))
              case _ => None
            }
          }.toMap
        if (defaultTest.isEmpty) Map.empty
        else {
          val aggs = defaultTest.toSeq.map { case (n, test) =>
            avg(when(test, 1.0d).otherwise(0.0d)).as(n) }
          sh.groupBy(col("_part")).agg(aggs.head, aggs.tail: _*)
            .collect().flatMap { r =>
              val part = r.getString(0)
              defaultTest.keys.flatMap { n =>
                val i = r.fieldIndex(n)
                val frac = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
                if (frac >= ratio) Some((part, n) -> "Sparse") else None
              }
            }.toMap
        }
      case None => Map.empty
    }

  /** table -> its Replicated* zookeeper path: tables sharing a path are
    * replicas of one another; metadata ALTERs propagate to all of them
    * (reference ReplicatedMergeTree ALTER via the replication log). */
  private val replicaGroup =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Drop the table-level TTL clause from a raw DDL tail (used by
    * ALTER ... MODIFY/REMOVE TTL so SHOW CREATE reflects the change). */
  private def stripTailTtl(raw: String): String =
    ("(?is)\\bTTL\\s+.+?(?=\\b(?:SETTINGS|ORDER\\s+BY|PARTITION\\s+BY|" +
      "PRIMARY\\s+KEY|SAMPLE\\s+BY|COMMENT)\\b|;?\\s*$)").r
      .replaceAllIn(raw, "").replaceAll("\\s+", " ").trim

  /** Every replica sharing `name`'s zookeeper path (incl. itself). */
  private def replicaSiblings(name: String): Seq[String] =
    replicaGroup.get(name) match {
      case Some(p) =>
        replicaGroup.collect { case (t, pp) if pp == p => t }.toSeq
      case None => Seq(name)
    }

  /** Render one projection the way SHOW CREATE does:
    * `    PROJECTION name\n    (\n        SELECT ...\n    )` with
    * multi-element GROUP BY / ORDER BY lists one key per line. */
  private def renderProjection(pname: String, body: String): String = {
    val compact = body.trim.replaceAll("\\s+", " ")
      .replaceAll("(?i)\\bas\\b", "AS")
      .replaceAll("(?i)\\bapply\\b", "APPLY")
      .replaceAll("(?i)\\bcount\\(", "count(")
    val kwRe = "(?i)\\b(WITH|SELECT|GROUP BY|ORDER BY)\\b".r
    // split at top-level clause keywords only (depth 0)
    val marks = kwRe.findAllMatchIn(compact).filter { m =>
      val pre = compact.take(m.start)
      pre.count(_ == '(') == pre.count(_ == ')') &&
        pre.count(_ == '\'') % 2 == 0
    }.toVector
    val clauses =
      if (marks.isEmpty) Vector(("", compact))
      else marks.zipWithIndex.map { case (m, i) =>
        val end = if (i + 1 < marks.length) marks(i + 1).start else compact.length
        (m.group(1).toUpperCase, compact.substring(m.end, end).trim)
      }
    val lines = clauses.map { case (kw, args) =>
      val items = splitArgs(args).map(_.trim).filter(_.nonEmpty)
      if (kw.isEmpty) "        " + args
      else if (items.length <= 1) s"        $kw $args"
      else s"        $kw\n" + items.map("            " + _).mkString(",\n")
    }
    s"    PROJECTION $pname\n    (\n${lines.mkString("\n")}\n    )"
  }

  /** Canonical skip-index definition text: outer parens of the key
    * expression stripped, whitespace collapsed, GRANULARITY defaulted to
    * 1 when omitted (reference IndicesDescription::parse). */
  private def normalizeIndexDef(d: String): String =
    "(?is)^(.*?)\\s+(TYPE\\s+.*)$".r.findFirstMatchIn(d.trim) match {
      case Some(mm) =>
        var e = mm.group(1).trim
        if (e.startsWith("(") && e.endsWith(")")) {
          val inner = e.substring(1, e.length - 1)
          var dd = 0; var ok = true
          inner.foreach { c =>
            if (c == '(') dd += 1
            else if (c == ')') { dd -= 1; if (dd < 0) ok = false } }
          if (ok && dd == 0) e = inner.trim
        }
        var t = mm.group(2).trim.replaceAll("\\s+", " ")
        if ("(?i)\\bGRANULARITY\\b".r.findFirstIn(t).isEmpty)
          t += " GRANULARITY 1"
        s"$e $t"
      case None => d.trim
    }

  /** Every SET name = value the session has issued, raw value text —
    * getSetting/getSettingOrDefault resolve against it at rewrite time
    * (`null` stays the literal NULL). */
  private val recordedSettings =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Reference defaults for settings tests read WITHOUT setting them. */
  private val defaultSettingValues: Map[String, String] = Map(
    "max_block_size" -> "65409",
    "enable_analyzer" -> "1", "allow_experimental_analyzer" -> "1")
  /** system.settings catalog: name -> (default value, type, tier,
    * description). A small curated slice of the reference's Settings.h —
    * enough for the common `SELECT value/changed/type FROM
    * system.settings WHERE name = '…'` probes; unlisted names that were
    * SET still appear (changed=1, type guessed from the value). */
  private val settingsCatalog: Seq[(String, String, String, String, String)] = Seq(
    ("max_block_size", "65409", "UInt64", "Production",
      "Maximum block size in rows for reading."),
    ("max_insert_block_size", "1048449", "UInt64", "Production",
      "The size of blocks in rows to form for insertion into a table."),
    ("insert_quorum", "0", "UInt64Auto", "Production",
      "Enables the quorum writes."),
    ("mysql_max_rows_to_insert", "65536", "UInt64", "Production",
      "The maximum number of rows in MySQL batch insertion of the MySQL storage engine."),
    ("async_insert", "0", "Bool", "Production",
      "If true, data from INSERT query is stored in queue and later flushed to table in background."),
    ("join_algorithm", "direct,parallel_hash,hash", "JoinAlgorithm", "Production",
      "Specifies which JOIN algorithm is used."),
    ("join_use_nulls", "0", "Bool", "Production",
      "Sets the type of JOIN behaviour: fill non-joined columns with NULLs or type defaults."),
    ("compatibility", "", "String", "Production",
      "Changes other settings according to provided ClickHouse version."),
    ("allow_experimental_analyzer", "1", "Bool", "Beta",
      "Allow new query analyzer."),
    ("enable_analyzer", "1", "Bool", "Beta",
      "Allow new query analyzer."),
    ("max_threads", "'auto(16)'", "MaxThreads", "Production",
      "The maximum number of query processing threads."),
    ("max_rows_to_read", "0", "UInt64", "Production",
      "Limitation on reading rows, applied on each shard separately."),
    ("send_timeout", "300", "Seconds", "Production",
      "Timeout for sending data to the network, in seconds."),
    ("allow_settings_after_format_in_insert", "0", "Bool", "Production",
      "Control whether SETTINGS after FORMAT in INSERT queries is allowed or not."),
    ("allow_experimental_lightweight_update", "0", "Bool", "Experimental",
      "Allow to use lightweight updates."),
    ("optimize_move_to_prewhere", "1", "Bool", "Production",
      "Enables or disables automatic PREWHERE optimization in SELECT queries."),
    ("background_pool_size", "16", "UInt64", "Obsolete",
      "Obsolete setting, does nothing."),
    ("drain_timeout", "3", "Seconds", "Obsolete",
      "Obsolete setting, does nothing."),
    ("format_avro_schema_registry_url", "", "URI", "Production",
      "For AvroConfluent format: Confluent Schema Registry URL."),
    ("format_csv_delimiter", ",", "Char", "Production",
      "The character to be considered as a delimiter in CSV data."),
    ("max_alter_threads", "'auto(16)'", "MaxThreads", "Obsolete",
      "Obsolete setting, does nothing."),
    ("output_format_orc_compression_method", "zstd", "ORCCompression", "Production",
      "Compression method for ORC output format."))

  /** SET on either of these applies to BOTH names (alias_for pairs). */
  private val settingAliases: Map[String, String] = Map(
    "allow_experimental_analyzer" -> "enable_analyzer",
    "enable_analyzer" -> "allow_experimental_analyzer")

  /** Rows of system.settings, reflecting this session's SETs. */
  private def settingsRows(): Seq[(String, String, Int, String, String,
      String, Int, String, String, String, Int, String)] = {
    def boolNorm(tpe: String, v: String): String =
      if (tpe == "Bool") {
        if (v.equalsIgnoreCase("true")) "1"
        else if (v.equalsIgnoreCase("false")) "0" else v
      } else v
    // SET compatibility = 'X.Y' implicitly marks version-dependent
    // settings changed and rewinds their values (reference
    // Settings::applyCompatibilitySetting) — modeled for the analyzer
    // pair, the one the compatibility anchors probe
    val compatVer: Option[(Int, Int)] = recordedSettings.get("compatibility")
      .map(_.stripPrefix("'").stripSuffix("'"))
      .flatMap(v => "^(\\d+)\\.(\\d+)".r.findFirstMatchIn(v)
        .map(m => (m.group(1).toInt, m.group(2).toInt)))
    val analyzerNames = Set("allow_experimental_analyzer", "enable_analyzer")
    val catalog = settingsCatalog.map { case (n, dflt, tpe, tier, desc) =>
      val recorded = recordedSettings.get(n)
        .orElse(settingAliases.get(n).flatMap(recordedSettings.get))
      val (value0, changed) = (recorded, compatVer) match {
        case (Some(r), _) => (r.stripPrefix("'").stripSuffix("'"), 1)
        case (None, Some((maj, min))) if analyzerNames.contains(n) &&
            (maj < 24 || (maj == 24 && min < 4)) =>
          // the analyzer default flipped in 24.4: older compatibility
          // targets rewind it (marked changed); 24.3 keeps value 1
          (if (maj == 24 && min == 3) "1" else "0", 1)
        case _ => (dflt, 0)
      }
      val value = boolNorm(tpe, value0)
      (n, value, changed, desc, "\\N", "\\N",
        0, tpe, dflt, "", if (tier == "Obsolete") 1 else 0, tier)
    }
    val known = settingsCatalog.map(_._1).toSet
    val extras = recordedSettings.toSeq.sortBy(_._1).collect {
      case (n, raw) if !known.contains(n) =>
        val v = raw.stripPrefix("'").stripSuffix("'")
        val custom = n.startsWith("custom_")
        val tpe =
          if (v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")) "Bool"
          else if (v.matches("\\d+")) "UInt64"
          else if (v.matches("-\\d+")) "Int64"
          else if (v.matches("-?\\d*\\.\\d+")) "Float64"
          else "String"
        val norm = boolNorm(tpe, v)
        if (custom)
          (n, s"${tpe}_$norm", 1, "", "\\N", "\\N", 0, "Custom", "", "", 0, "Custom")
        else (n, norm, 1, "", "\\N", "\\N", 0, tpe, "", "", 0, "Production")
    }
    catalog ++ extras
  }

  /** The clickhouse-test server macros (tests/config/config.d/macros.xml). */
  private val testMacros: Map[String, String] = Map(
    "test" -> "Hello, world!", "shard" -> "s1", "replica" -> "r1",
    "default_cluster_macro" -> "test_shard_localhost",
    "default_path_test" -> "/clickhouse/tables/{database}/{shard}/",
    "default_name_test" -> "table_{table}")

  /** Per-table shadow of the data WITH the MergeTree row virtuals
    * (_part, _partition_id, _block_number, _part_offset,
    * _sample_factor), maintained at INSERT; reads that mention one are
    * routed here (reference MergeTreeVirtualColumns). */
  private val virtualShadow =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  /** DETACHed parts' rows (with virtuals), awaiting ATTACH. */
  private val detachedRows =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val virtualColNames = Seq(
    "_part", "_partition_id", "_partition_value", "_block_number",
    "_part_offset", "_sample_factor")

  /** Record an insert block's data parts and extend the virtual-column
    * shadow (bounded lineage: shadow re-reads stay cheap at test scale;
    * at production scale parts metadata comes from the table format's
    * manifest, not from tracking). */
  private def recordPartsBlock(spark: SparkSession, name: String,
                               sorted: DataFrame,
                               original: DataFrame = null): Unit =
    if (ChParts.isTracked(name)) try {
      val tagged0 = ChParts.tagBlock(spark, name, sorted, e => rewrite(e),
        ordSource = original)
      if (!(tagged0 eq sorted)) {
        val tagged = tagged0
          .withColumn("_partition_id",
            org.apache.spark.sql.functions.expr(
              "substring_index(_part, '_', 1)"))
          .withColumn("_sample_factor",
            org.apache.spark.sql.functions.lit(1.0))
        val merged = virtualShadow.get(name) match {
          case Some(prev) => prev.unionByName(tagged)
          case None => tagged
        }
        virtualShadow.put(name,
          if (ChParts.partsOf(name).length % 24 == 0) merged.localCheckpoint()
          else merged)
      }
    } catch { case scala.util.control.NonFatal(e) =>
      if (sys.env.contains("GRAFT_PARTS_DEBUG"))
        System.err.println(s"[parts] tagBlock($name) failed: $e")
      virtualShadow.remove(name) // never let bookkeeping break the INSERT
    }

  /** Apply part renames (merge/mutation) to the shadow's `_part`. */
  private def renameShadowParts(name: String,
                                renames: Map[String, String]): Unit =
    if (renames.nonEmpty) virtualShadow.get(name).foreach { sh =>
      import org.apache.spark.sql.functions.{col, lit, when, expr}
      val rs = renames.toSeq
      val nc = rs.tail.foldLeft(
        when(col("_part") === lit(rs.head._1), lit(rs.head._2))) {
        case (acc, (o, n)) => acc.when(col("_part") === lit(o), lit(n))
      }.otherwise(col("_part"))
      virtualShadow.put(name, sh.withColumn("_part", nc)
        .withColumn("_partition_id",
          expr("substring_index(_part, '_', 1)")))
    }

  /** Canonical SHOW CREATE clause block from a raw DDL tail: `ENGINE =
    * X`, each storage clause on its own line, and the default
    * `SETTINGS index_granularity = 8192` appended for modern MergeTree
    * declarations (the reference's formatter output shape). */
  /** Re-render every single-quoted literal the way the reference's
    * formatter does (parse the escapes, then writeQuotedString): the
    * round trip doubles bare backslashes (`'m\[0-9\]'` -> `'m\\[0-9\\]'`,
    * 01298) and is the identity on plain text. Outside literals,
    * constant-folds currentDatabase() to 'default' (SHOW CREATE
    * evaluates it). */
  private def rerenderTailLiterals(s0: String): String = {
    val s = "(?i)currentDatabase\\(\\)".r.replaceAllIn(s0, "'default'")
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\'') { sb.append(c); i += 1 }
      else {
        // parse the literal value (CH lexer: recognized escapes decode,
        // unknown escapes KEEP the backslash)
        val v = new StringBuilder
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < s.length) {
            val n = s.charAt(i + 1)
            n match {
              case '\\' => v.append('\\')
              case '\'' => v.append('\'')
              case 'n' => v.append('\n')
              case 't' => v.append('\t')
              case 'r' => v.append('\r')
              case '0' => v.append('\u0000')
              case other => v.append('\\').append(other)
            }
            i += 2
          } else if (ch == '\'') { closed = true; i += 1 }
          else { v.append(ch); i += 1 }
        }
        sb.append('\'')
        v.foreach {
          case '\\' => sb.append("\\\\")
          case '\'' => sb.append("\\'")
          case '\n' => sb.append("\\n")
          case '\t' => sb.append("\\t")
          case '\r' => sb.append("\\r")
          case '\u0000' => sb.append("\\0")
          case ch => sb.append(ch)
        }
        sb.append('\'')
      }
    }
    sb.toString
  }

  /** `expr + INTERVAL 1 MONTH` renders canonically as
    * `expr + toIntervalMonth(1)` in stored DDL (reference formatAST on
    * ASTFunction toIntervalMonth — INTERVAL sugar parses to the fn). */
  private def canonicalizeIntervals(s: String): String =
    ("(?i)\\bINTERVAL\\s+(\\d+|'[^']*')\\s+" +
      "(SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|QUARTER|YEAR)S?\\b").r
      .replaceAllIn(s, m =>
        s"toInterval${m.group(2).toLowerCase.capitalize}(${m.group(1)})")

  private def formatDdlTail(raw0: String, autoSettings: Boolean = true): String = {
    val raw = rerenderTailLiterals(raw0.trim.stripSuffix(";").trim
      .replaceAll("\\s+", " "))
    if (raw.isEmpty) return "ENGINE = Memory"
    val clauseRe = ("(?i)\\b(ENGINE\\s*=?|PARTITION BY|PRIMARY KEY|ORDER BY|" +
      "SAMPLE BY|TTL|SETTINGS|COMMENT)\\b").r
    val ms = clauseRe.findAllMatchIn(raw).toVector
    if (ms.isEmpty) return "ENGINE = Memory"
    val parts = ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.length) ms(i + 1).start else raw.length
      val kw = m.group(1).toUpperCase.replaceAll("\\s*=\\s*$", "").trim
      val body0 = raw.substring(m.end, end).trim.stripPrefix("=").trim
      // `ORDER BY ()` is the empty tuple — canonically `tuple()`
      val body = if (body0 == "()") "tuple()" else body0
      (kw, body)
    }
    val engine = parts.find(_._1 == "ENGINE").map(_._2).getOrElse("Memory")
    // canonical clause order (reference formatAST for CREATE storage):
    // PARTITION BY, PRIMARY KEY, ORDER BY, SAMPLE BY, TTL, SETTINGS
    val clauseOrder = Seq("PARTITION BY", "PRIMARY KEY", "ORDER BY",
      "SAMPLE BY", "TTL", "SETTINGS", "COMMENT")
    val rest = parts.filterNot(_._1 == "ENGINE")
      .sortBy(p => clauseOrder.indexOf(p._1) match {
        case -1 => clauseOrder.length
        case n => n
      })
      .map {
        case ("SETTINGS", body) =>
          // reference renders `name = value` with spaces
          "SETTINGS " + body.replaceAll("\\s*=\\s*", " = ")
        case ("TTL", body) => "TTL " + canonicalizeIntervals(body)
        case (kw, body) => s"$kw $body"
      }
    // modern declarations carry their ORDER BY / PARTITION BY as
    // clauses (the legacy MergeTree(date, key, granularity) form holds
    // them inside the engine args and gets NO settings line, 00061)
    val isModernMergeTree =
      engine.toLowerCase.contains("mergetree") &&
        parts.exists(p => p._1 == "ORDER BY" || p._1 == "PARTITION BY" ||
          p._1 == "PRIMARY KEY")
    val withSettings =
      if (isModernMergeTree && autoSettings && !parts.exists(_._1 == "SETTINGS"))
        rest :+ "SETTINGS index_granularity = 8192"
      else rest
    (s"ENGINE = ${engine.replaceAll("\\(\\s*\\)$", "")}" +: withSettings)
      .mkString("\n")
  }

  /** Full declared column metadata per bare-created table, for DESCRIBE
    * (reference InterpreterDescribeQuery prints name, DECLARED type,
    * default kind/expression, comment, codec, ttl — 7 TSV fields). */
  private val tableColMeta = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(String, String, String, String)]]

  /** The DECLARED CH type of `col` in any of `tables` (first match) —
    * lets renderers (JSONEachRow 64-bit quoting, DateTime64 scale)
    * distinguish widths the Spark type erases (UInt32 vs UInt64 both
    * arrive as LongType). */
  def declaredTypeOf(tables: Iterable[String], col: String): Option[String] =
    tables.iterator.flatMap(t => tableColMeta.get(t)
      .flatMap(_.find(_._1 == col).map(_._2))).toSeq.headOption

  /** A literal Decimal scale above SPARK'S 38-digit cap clamps (the
    * Decimal256(75) family in avg_weighted.xml — unrepresentable here,
    * clamp to 30 for integer headroom). A scale that merely exceeds the
    * REQUESTED type's own precision (toDecimal32(x, 10)) passes through
    * unclamped so Spark's scale>precision rejection reproduces the
    * reference's ARGUMENT_OUT_OF_BOUND (01425). */
  private def clampScale(s: String, p: Int): String = {
    val t = s.trim
    if (!t.matches("\\d+")) t
    // >38 scales clamp to 30, keeping integer headroom for sums
    // (same rule as ChTypes.clampedScale; avg_weighted.xml)
    else if (t.toLong > 38) math.min(p, 30).toString
    else t
  }

  /** INSERT conversion to a narrow integer column WRAPS like the
    * reference (toInt8(1250) = -62, NumberTraits wraparound;
    * joins_in_memory.xml inserts 40000 into an Int8 column) instead of
    * throwing Spark's ANSI CAST_OVERFLOW. Applied only when the incoming
    * Spark type differs from the target (a real conversion). */
  private def chIntWrapCast(c: org.apache.spark.sql.Column, chType: String,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{pmod, lit}
    val base = chType.replaceAll("^(?:Nullable|LowCardinality)\\(", "")
      .takeWhile(ch => ch.isLetterOrDigit)
    def wrap(m: Long, signed: Boolean): org.apache.spark.sql.Column = {
      val l = c.cast(org.apache.spark.sql.types.LongType)
      val u = pmod(l, lit(m))
      val w =
        if (signed)
          org.apache.spark.sql.functions.when(u >= lit(m / 2), u - lit(m))
            .otherwise(u)
        else u
      // Pmod declares nullable=true unconditionally; that bit would leak
      // into the table's schema and turn off the CH outer-join default
      // fill (ChJoinDefaults keys on pre-join non-nullability — 02461/
      // 03282 regression). The wrap of a non-null input is never null,
      // and a NULL input into a non-Nullable CH column becomes the type
      // default anyway (input_format_null_as_default=1): coalesce with 0
      // restores the non-nullable bit. A DECLARED Nullable(T) column
      // keeps its NULLs (00543/01457/02015 — NULL must survive).
      (if (chType.trim.toLowerCase.startsWith("nullable("))
        w
      else org.apache.spark.sql.functions.coalesce(w, lit(0L))).cast(dt)
    }
    base match {
      case "Int8" => wrap(256L, signed = true)
      case "UInt8" => wrap(256L, signed = false)
      case "Int16" => wrap(65536L, signed = true)
      case "UInt16" => wrap(65536L, signed = false)
      case "Int32" => wrap(4294967296L, signed = true)
      case "UInt32" => wrap(4294967296L, signed = false)
      case _ => c.cast(dt)
    }
  }

  /** Columns of `table` DECLARED unsigned (UInt*) — partition-key modulo
    * on these keeps a plain remainder (ChParts.wrapModulo). */
  private def unsignedColsOf(table: String): Set[String] =
    tableColMeta.get(table).map(_.collect {
      case (cn, ct, _, _) if ct
        .replaceAll("^(?:Nullable|LowCardinality)\\(", "")
        .startsWith("UInt") => cn
    }.toSet).getOrElse(Set.empty)

  /** True when `col` in the statement's FROM tables is DECLARED Bool —
    * those render true/false while computed predicates keep CH's 1/0
    * (reference DataTypeBool SerializationBool vs UInt8). */
  def boolColHint(col: String, stmt: String): Boolean = {
    val ts = "(?i)\\b(?:FROM|JOIN)\\s+`?([\\w.]+)`?".r.findAllMatchIn(stmt)
      .map(_.group(1).stripPrefix("default.").stripPrefix("__vt_")).toSeq
    declaredTypeOf(ts, col).exists(t =>
      t.replaceAll("^(?:Nullable|LowCardinality)\\(", "").startsWith("Bool"))
  }

  /** Columns ADDed by ALTER with no DEFAULT and never written: CH stores
    * no data for them, so reads substitute the CURRENT type's default —
    * a later MODIFY re-defaults instead of casting the old fill. */
  private val alterVirtualCols =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  /** MATERIALIZED/ALIAS columns per table: excluded from positional
    * INSERT targets (reference ColumnsDescription::getInsertable) —
    * their values always compute from the declared expression. */
  private val hiddenInsertCols =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  /** Flattened Nested sub-columns (`nest.x` from `nest Nested(x T)`) —
    * dotted names that must be BACKTICK-quoted before Spark parses them
    * as struct access (reference NestedUtils::flatten). */
  private val nestedColNames =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Engine metadata from a CREATE tail: the modern spelling (family
    * params inside ENGINE(...), sort key in ORDER BY) or the deprecated
    * positional spelling `Engine(date[, sampling], key, granularity
    * [, family params])` (reference registerStorageMergeTree.cpp,
    * allow_deprecated_syntax_for_merge_tree). */
  private def parseEngineMeta(rest: String): Option[EngineMeta] = {
    val em = ("(?is)ENGINE\\s*=?\\s*(?:Replicated)?(Replacing|Summing|Aggregating|Collapsing|" +
      "VersionedCollapsing|)MergeTree\\s*(?:\\(((?:[^()]|\\([^()]*\\))*)\\))?").r
      .findFirstMatchIn(rest).getOrElse(return None)
    // plain MergeTree records the sort key only (block ordering); the
    // merge families add their FINAL/OPTIMIZE transforms
    val family = em.group(1).toLowerCase match {
      case "" => "mergetree"
      case f => f
    }
    val args = Option(em.group(2))
      .map(a => splitArgs(a).map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
    def unt(s: String) = s.stripPrefix("`").stripSuffix("`")
    def tupleEls(s: String): Seq[String] =
      if (s.startsWith("(")) splitArgs(s.stripPrefix("(").stripSuffix(")"))
        .map(t => unt(t.trim)).filter(_.nonEmpty)
      else Seq(unt(s))
    val granIdx = args.indexWhere(_.matches("\\d+"))
    val (keys, params) =
      if (granIdx >= 1) {
        // deprecated positional form; merge groups live inside the date
        // partition, so the date column joins the effective key
        (unt(args.head) +: tupleEls(args(granIdx - 1)).filterNot(_ == unt(args.head)),
          args.drop(granIdx + 1))
      } else {
        ("(?is)\\bORDER\\s+BY\\s+(\\((?:[^()]|\\([^()]*\\))*\\)|[^\\s;()]+)".r
          .findFirstMatchIn(rest).map(m => tupleEls(m.group(1)))
          .getOrElse(Seq.empty), args)
      }
    if (keys.isEmpty || !keys.forall(_.matches("\\w+"))) None
    else family match {
      case "replacing" =>
        Some(EngineMeta(family, keys, None, params.headOption.map(unt), Nil))
      case "summing" =>
        Some(EngineMeta(family, keys, None, None,
          params.headOption.map(tupleEls).getOrElse(Nil)))
      case "collapsing" =>
        Some(EngineMeta(family, keys, params.headOption.map(unt), None, Nil))
      case "versionedcollapsing" =>
        Some(EngineMeta(family, keys, params.headOption.map(unt),
          params.lift(1).map(unt), Nil))
      case _ =>
        // plain MergeTree / Aggregating: sort key recorded for block
        // ordering; no merge transform (-State/-Merge is the agg path)
        Some(EngineMeta(family, keys, None, None, Nil))
    }
  }

  /** The merged (FINAL) view of an engine table, or None when the
    * recorded key/params don't resolve against the current schema. */
  /** A MergeTree part is SORTED by the table's sort key at write: each
    * INSERT block reads back key-ordered (parts keep insert order, rows
    * within a part don't — reference MergeTreeDataWriter). */
  private def sortInsertBlock(block: DataFrame, name: String): DataFrame =
    tableEngines.get(name) match {
      case Some(meta) if meta.keys.nonEmpty &&
          meta.keys.forall(k => block.columns.exists(_.equalsIgnoreCase(k))) &&
          // maps aren't orderable in Spark (CH orders them bytewise) —
          // leave such blocks in insertion order
          !meta.keys.exists(k => block.schema.fields
            .exists(f => f.name.equalsIgnoreCase(k) &&
              f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])) =>
        block.orderBy(meta.keys.map(k =>
          org.apache.spark.sql.functions.col(s"`$k`")): _*)
      case _ => block
    }

  private def engineFinalDf(spark: SparkSession, name: String): Option[DataFrame] = {
    // the merge plan builds its own outer joins whose NULL-extension is
    // coalesced HERE — the anchor runner's ChJoinDefaults rule must not
    // rewrite them (plans analyze eagerly, so gating construction is
    // enough; the returned DataFrame stays analyzed)
    val jd = spark.conf.getOption("spark.graft.chJoinDefaults")
    spark.conf.set("spark.graft.chJoinDefaults", "false")
    try engineFinalDfImpl(spark, name)
    finally jd match {
      case Some(v) => spark.conf.set("spark.graft.chJoinDefaults", v)
      case None => spark.conf.unset("spark.graft.chJoinDefaults")
    }
  }

  private def engineFinalDfImpl(spark: SparkSession, name: String): Option[DataFrame] =
    tableEngines.get(name).flatMap { meta =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.NumericType
      val view = spark.table(name)
      // flattened Nested columns carry dots — always backtick-quote
      def c(n: String) = col(s"`$n`")
      // prefer the INSERT-stamped backing (recorded block sequence) when
      // its schema still matches the public view; fall back to the view
      // otherwise (post-ALTER/mutation — single merged block semantics)
      val backing = engineBacking.get(name).filter { b =>
        b.schema.fields.filterNot(_.name == "__gblock")
          .map(f => (f.name, f.dataType)).toIndexedSeq ==
          view.schema.fields.map(f => (f.name, f.dataType)).toIndexedSeq
      }
      // summing merges are order-independent (sum per key) and
      // auto-discover numeric measures — keep them on the plain view so
      // __gblock is never swept in as a measure
      val t = if (meta.family == "summing") view else backing.getOrElse(view)
      // insert-order tiebreak: recorded block sequence first (exact
      // cross-INSERT order, reference block-number merge order), mono id
      // within a block (CH guarantees per-part key order only)
      val insOrd: Seq[org.apache.spark.sql.Column] =
        if (backing.isDefined) Seq(c("__gblock"), monotonically_increasing_id())
        else Seq(monotonically_increasing_id())
      val lower = t.columns.map(_.toLowerCase).toSet
      val keys = meta.keys.filter(k => lower.contains(k.toLowerCase))
      val orig = view.columns.toIndexedSeq.map(c)
      if (keys.size != meta.keys.size || keys.isEmpty) None
      else (meta.family match {
        case "replacing" =>
          // no version column -> last inserted row wins, in RECORDED
          // insert order (block sequence, then within-block id)
          val ver = meta.version.filter(v => lower.contains(v.toLowerCase))
            .map(col).toSeq ++ insOrd
          Some(graft.ops.EngineViews.replacingFinal(t, keys, ver).select(orig: _*))
        case "summing" =>
          import org.apache.spark.sql.types.ArrayType
          // flattened Nested groups (>=2 parallel array columns under
          // one prefix) merge as MAPS: per-key element-wise value sums,
          // zero-valued entries dropped, result sorted by map key
          // (reference SummingSortedAlgorithm nested-map mode)
          val mapGroups: Seq[(String, Seq[String])] = t.columns
            .filter(_.contains('.')).groupBy(_.takeWhile(_ != '.')).toSeq
            .map { case (p, cs) => p ->
              t.columns.filter(_.startsWith(p + ".")).toSeq }
            .filter { case (p, cs) =>
              // a Nested group map-merges only when its NAME ends in
              // "Map" (or it is explicitly listed as a summed column),
              // it has >= 2 columns, and every VALUE column is
              // arithmetic (reference SummingSortedAlgorithm
              // isInPrimaryKey/maps_to_sum discovery)
              (p.endsWith("Map") ||
                meta.measures.exists(_.equalsIgnoreCase(p))) &&
              cs.length >= 2 &&
              cs.forall(n => t.schema(n).dataType.isInstanceOf[ArrayType]) &&
              cs.tail.forall(n => t.schema(n).dataType
                .asInstanceOf[ArrayType].elementType.isInstanceOf[NumericType]) }
            .sortBy(_._1)
          val mapCols = mapGroups.flatMap(_._2).toSet
          val measures =
            if (meta.measures.nonEmpty)
              meta.measures.filter(m => lower.contains(m.toLowerCase))
            else t.schema.fields.toIndexedSeq
              .filter(f => f.dataType.isInstanceOf[NumericType])
              .map(_.name).filterNot(n => keys.exists(_.equalsIgnoreCase(n)))
          if (measures.isEmpty && mapGroups.isEmpty) None
          else {
            val others = t.columns.filterNot(x =>
              keys.exists(_.equalsIgnoreCase(x)) ||
                measures.exists(_.equalsIgnoreCase(x)) || mapCols.contains(x))
            val aggs = measures.map(m =>
              sum(c(m)).cast(t.schema(m).dataType).as(m)) ++
              others.map(o => first(c(o)).as(o))
            var g =
              if (aggs.nonEmpty)
                t.groupBy(keys.map(c): _*).agg(aggs.head, aggs.tail: _*)
              else t.select(keys.map(c): _*).distinct()
            for ((_, cs) <- mapGroups) {
              val vIdx = cs.indices.drop(1)
              val aliased = t.select(keys.map(c) ++
                cs.zipWithIndex.map { case (n, ix) => c(n).as(s"__n$ix") }: _*)
              val ex = aliased.select(keys.map(c) :+
                explode(arrays_zip(cs.indices.map(ix => col(s"__n$ix")): _*))
                  .as("__e"): _*)
              val sums = vIdx.map(ix => sum(col(s"__e.__n$ix"))
                .cast(t.schema(cs(ix)).dataType
                  .asInstanceOf[ArrayType].elementType).as(s"__s$ix"))
              val per = ex
                .groupBy(keys.map(c) :+ col("__e.__n0").as("__k"): _*)
                .agg(sums.head, sums.tail: _*)
              val entry = struct(col("__k").as("k") +:
                vIdx.map(ix => col(s"__s$ix").as(s"v$ix")): _*)
              val outCols = keys.map(c) ++ cs.zipWithIndex.map { case (n, ix) =>
                (if (ix == 0) col("__m").getField("k")
                 else col("__m").getField(s"v$ix")).as(n)
              }
              val merged = per
                .filter(vIdx.map(ix => col(s"__s$ix") =!= lit(0)).reduce(_ || _))
                .groupBy(keys.map(c): _*)
                .agg(sort_array(collect_list(entry)).as("__m"))
                .select(outCols: _*)
              g = g.join(merged, keys, "left")
              // a group whose map fully cancelled keeps an EMPTY array
              for (n <- cs) g = g.withColumn(n, coalesce(c(n),
                lit(Array.empty[Int]).cast(t.schema(n).dataType)))
            }
            // a group whose every summed column lands on zero (and whose
            // every merged map emptied) is DELETED at merge
            val zeroTests = measures.map(m => c(m) =!= lit(0)) ++
              mapGroups.map { case (_, cs) => size(c(cs.head)) > 0 }
            Some(g.filter(zeroTests.reduce(_ || _)).select(orig: _*))
          }
        case "collapsing" =>
          // CollapsingSortedAlgorithm, faithfully: per key in row order,
          // pos>neg -> keep the LAST positive; neg>pos -> keep the FIRST
          // negative; equal & last row negative -> fully cancelled;
          // equal & last row positive (order "broken") -> keep BOTH the
          // first negative and the last positive
          meta.sign.filter(s => lower.contains(s.toLowerCase)).map { s =>
            // struct-valued order: (block sequence, within-block id) —
            // min/max/equality on structs compare lexicographically.
            // Per-key stats come from ONE window pass, not groupBy+join:
            // __ord contains monotonically_increasing_id, and a join
            // would evaluate the id subtree TWICE — two evaluations of a
            // nondeterministic id need not agree (range-partitioned
            // insert blocks sample their sort boundaries), so __lpos
            // could match no row. The window shuffles rows WITH their
            // already-computed __ord, one consistent evaluation (and one
            // exchange instead of two + a join).
            val t2 = t.withColumn("__ord",
              struct(insOrd.zipWithIndex.map { case (x, i) => x.as(s"_$i") }: _*))
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(c): _*)
            val j = t2
              .withColumn("__pos", sum(when(c(s) > 0, 1).otherwise(0)).over(w))
              .withColumn("__neg", sum(when(c(s) < 0, 1).otherwise(0)).over(w))
              .withColumn("__fneg", min(when(c(s) < 0, col("__ord"))).over(w))
              .withColumn("__lpos", max(when(c(s) > 0, col("__ord"))).over(w))
              .withColumn("__last", max(struct(col("__ord").as("o"),
                c(s).cast("int").as("sg"))).over(w))
            val keep =
              (col("__pos") > col("__neg") && col("__ord") === col("__lpos")) ||
              (col("__neg") > col("__pos") && col("__ord") === col("__fneg")) ||
              (col("__pos") === col("__neg") &&
                col("__last").getField("sg") > 0 &&
                (col("__ord") === col("__fneg") || col("__ord") === col("__lpos")))
            j.filter(keep).select(orig: _*)
          }
        case "versionedcollapsing" =>
          meta.sign.filter(s => lower.contains(s.toLowerCase)).map { s =>
            val order = meta.version.filter(v => lower.contains(v.toLowerCase))
              .map(col).toSeq ++ insOrd
            graft.ops.EngineViews.collapsingFinal(t, keys, col(s), order)
              .select(orig: _*)
          }
        case _ => None
      // a MergeTree read returns rows in sort-key order (reference
      // part-order reads) — the merged view must too
      }).map(_.orderBy(keys.map(c): _*))
    }

  private val ajCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** `FROM <src> [LEFT] ARRAY JOIN <item>[, ...]` (reference
    * ArrayJoinAction / TranslateQualifiedNamesVisitor): the listed
    * arrays explode in LOCKSTEP — one output row per element position,
    * not a cross product. An UNALIASED column item is REPLACED by its
    * element; an aliased item keeps the original array and binds the
    * alias to the element; a bare Nested-group name zips all its
    * sub-arrays. Plain ARRAY JOIN drops empty-array rows; LEFT keeps
    * them with the element-type DEFAULT. Rewritten by materializing the
    * source, exploding in the DataFrame API, and substituting a temp
    * view for the whole clause. */
  private def rewriteArrayJoin(spark: SparkSession, dir: String, q0: String): String = {
    if (!"(?is)\\bARRAY\\s+JOIN\\b".r.findFirstIn(q0).isDefined) return q0
    val re = ("(?is)\\bFROM\\s+(`?[\\w.]+`?|\\((?:[^()]|\\((?:[^()]|\\([^()]*\\))*\\))*\\))" +
      "(\\s+(?:AS\\s+)?(?!LEFT\\b|ARRAY\\b)[A-Za-z_]\\w*)?\\s+(LEFT\\s+)?ARRAY\\s+JOIN\\s+").r
    val m = re.findFirstMatchIn(q0).getOrElse(return q0)
    // items run to the next top-level clause keyword (or end/paren close)
    val stops = Seq("where", "prewhere", "group", "having", "order",
      "limit", "settings", "union", "format", "qualify")
    var i = m.end; var depth = 0; var inStr = false; var end = -1
    while (i < q0.length && end < 0) {
      val ch = q0.charAt(i)
      if (inStr) { if (ch == '\'') inStr = false }
      else if (ch == '\'') inStr = true
      else if (ch == '(') depth += 1
      else if (ch == ')') { depth -= 1; if (depth < 0) end = i }
      else if (depth == 0 && (i == 0 || !Character.isLetterOrDigit(q0.charAt(i - 1)))) {
        val w = q0.substring(i).takeWhile(_.isLetter).toLowerCase
        if (stops.contains(w)) end = i
      }
      i += 1
    }
    if (end < 0) end = q0.length
    val items0 = splitArgs(q0.substring(m.end, end)).map(_.trim).filter(_.nonEmpty)
    if (items0.isEmpty)
      throw new IllegalArgumentException(
        "NUMBER_OF_ARGUMENTS_DOESNT_MATCH: ARRAY JOIN needs at least one array")
    val left = m.group(3) != null
    val srcText = m.group(1)
    import org.apache.spark.sql.functions._
    val base = sql(spark, dir,
      if (srcText.startsWith("(")) s"SELECT * FROM $srcText"
      else s"SELECT * FROM $srcText")
    val baseCols = base.columns.toIndexedSeq
    def bt(s: String) = s.stripPrefix("`").stripSuffix("`")
    // (array expr text, element name, shadowed base column)
    val resolved: Seq[(String, String, Option[String])] = items0.flatMap { it =>
      val (ex, al) = "(?is)^(.*?)\\s+AS\\s+(`?[\\w.]+`?)\\s*$".r
        .findFirstMatchIn(it) match {
        case Some(am) => (am.group(1).trim, Some(bt(am.group(2))))
        case None => (it, None)
      }
      val exName = bt(ex)
      if (baseCols.contains(exName))
        Seq((s"`$exName`", al.getOrElse(exName),
          if (al.isEmpty) Some(exName) else None))
      else if (baseCols.exists(_.startsWith(exName + "."))) {
        baseCols.filter(_.startsWith(exName + ".")).map { n =>
          val sub = n.drop(exName.length + 1)
          val out = al.map(a => s"$a.$sub").getOrElse(n)
          (s"`$n`", out, if (al.isEmpty) Some(n) else None)
        }
      } else {
        // expression item: dotted Nested names inside it need quoting
        // before Spark parses them as struct access
        var exq = ex
        nestedColNames.forEach { n =>
          exq = exq.replaceAll(
            "(?<![\\w`.])" + java.util.regex.Pattern.quote(n) + "(?![\\w`])",
            java.util.regex.Matcher.quoteReplacement(s"`$n`"))
        }
        Seq((rewrite(exq), al.getOrElse(exName), None))
      }
    }
    // pre-project the arrays so arrays_zip gets stable field names
    val pre = resolved.zipWithIndex.foldLeft(base) { case (d, ((ex, _, _), ix)) =>
      d.withColumn(s"__ajin$ix", expr(ex))
    }
    val zipC = arrays_zip(resolved.indices.map(ix => col(s"__ajin$ix")): _*)
    val exploded = pre.withColumn("__aj",
      if (left) explode_outer(zipC) else explode(zipC))
    def elemDefault(ix: Int): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.types._
      exploded.schema(s"__ajin$ix").dataType match {
        case ArrayType(StringType | BinaryType, _) => lit("")
        case ArrayType(DateType, _) => expr("DATE'1970-01-01'")
        case ArrayType(_: TimestampType | TimestampNTZType, _) =>
          expr("to_timestamp(0)")
        case ArrayType(et: NumericType, _) => lit(0).cast(et)
        case ArrayType(et, _) => lit(null).cast(et)
        case _ => lit(null)
      }
    }
    def elemCol(ix: Int): org.apache.spark.sql.Column = {
      val f = col("__aj").getField(s"__ajin$ix")
      if (left) coalesce(f, elemDefault(ix)) else f
    }
    val shadowed = resolved.flatMap(_._3).toSet
    val byShadow = resolved.zipWithIndex
      .collect { case ((_, out, Some(s0)), ix) => s0 -> (out, ix) }.toMap
    // original column order, replacements in place; aliased elements append
    val keep = baseCols.map { n =>
      byShadow.get(n) match {
        case Some((out, ix)) => elemCol(ix).as(out)
        case None => col(s"`$n`")
      }
    }
    val appended = resolved.zipWithIndex
      .collect { case ((_, out, None), ix) => elemCol(ix).as(out) }
    val result = exploded.select(keep ++ appended: _*)
    val view = s"__aj${ajCounter.incrementAndGet()}"
    result.createOrReplaceTempView(view)
    result.columns.filter(_.contains('.')).foreach(nestedColNames.add)
    val alias = Option(m.group(2)).getOrElse("")
    rewriteArrayJoin(spark, dir,
      q0.substring(0, m.start) + s" FROM $view$alias " + q0.substring(end))
  }

  /** Distributed-engine tables: proxy name -> (underlying local table,
    * shard count). Reads fan out over every shard (each shard is this
    * process, so N shards re-read the underlying table N times); writes
    * route to the underlying table (reference StorageDistributed). */
  private val distributedTables =
    scala.collection.concurrent.TrieMap.empty[String, (String, Int)]

  /** Distributed routing INTENT for proxies whose target didn't exist
    * at create — consulted only for cycle detection (INFINITE_LOOP). */
  private val distributedIntents =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Materialized views by SOURCE table: src -> (mv name, SELECT text).
    * The reference's MV semantics: the SELECT runs over each INSERTED
    * block and appends to the view's storage (StorageMaterializedView) —
    * not a recompute over the source. */
  private val matViews =
    scala.collection.concurrent.TrieMap.empty[String, List[(String, String)]]

  /** ReplicatedMergeTree zookeeper path -> first table registered on it;
    * later tables on the same path are replicas — reads alias the
    * canonical table's content. */
  private val replicaPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Columns declared Dynamic/JSON/Variant per table — the reference
    * forbids ALTER UPDATE on them (CANNOT_UPDATE_COLUMN). */
  private val dynamicCols =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  /** One CSV line -> cells, honoring double-quoted fields with ""
    * escapes (reference Formats/Impl CSVRowInputFormat). */
  /** TSV field unescape in ONE left-to-right pass (the reference's
    * Formats/TabSeparated escaping): `\\t` after `\\\\` replacement
    * order would turn `\\\\t` into backslash+TAB instead of literal
    * `\t`. */
  private[sqlfront] def unescapeTsv(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '0' => sb.append('\u0000'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private[sqlfront] def splitCsvLine(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0; var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else if (c == '"') inQ = false
        else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.map(s => if (s == "\\N") null else s).toSeq
  }

  /** DETACH TABLE stash: name -> the table's content at detach time. */
  private val detachedTables =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** vector_similarity index declarations: table -> (column, dimension).
    * Inserted vectors of any other size are INCORRECT_DATA (reference
    * MergeTreeIndexVectorSimilarity insert validation). */
  private val vectorIndexDims =
    scala.collection.concurrent.TrieMap.empty[String, (String, Int)]

  private def safeViewName(name: String): String =
    if (name.matches("[A-Za-z_]\\w*")) name
    // the system fixtures are registered under underscore names — never
    // mint a t_* alias for them (it would rewrite system.one everywhere)
    else if (name.equalsIgnoreCase("system.one")) "system_one"
    else if (name.equalsIgnoreCase("system.numbers")) "system_numbers"
    else if (name.equalsIgnoreCase("system.tables")) "system_tables"
    else if (name.equalsIgnoreCase("system.columns")) "system_columns"
    else tableAliases.getOrElseUpdate(name, "t_" + name.replaceAll("\\W", "_"))

  /** Re-register every Distributed proxy over `underlying` after its
    * contents changed (temp views capture the plan at registration). */
  private def refreshDistributed(spark: SparkSession, underlying: String): Unit =
    for ((d, (u, sh)) <- distributedTables if u == underlying) {
      val base = spark.table(u)
      (1 until sh).foldLeft(base)((x, _) => x.unionAll(base))
        .createOrReplaceTempView(d)
    }

  /** Vector-similarity index dimension check on an inserted block
    * (reference: INCORRECT_DATA when an array's size differs from the
    * index's declared dimension). */
  private def checkVectorDims(name: String, block: DataFrame): Unit = {
    for ((col, dim) <- vectorIndexDims.get(name)
         if block.columns.contains(col)) {
      val badRows = block.filter(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col(col)) =!= dim).count()
      if (badRows > 0) throw new IllegalArgumentException(
        s"INCORRECT_DATA: $badRows vectors in $col are not of dimension $dim")
    }
    // flattened Nested groups are PARALLEL arrays: every element column
    // must have the same per-row length (reference
    // NestedUtils::validateArraySizes, 00698)
    locally {
      import org.apache.spark.sql.functions.{col => fcol, size => fsize}
      import org.apache.spark.sql.types.ArrayType
      val groups = block.columns.filter(_.contains('.'))
        .groupBy(_.takeWhile(_ != '.'))
        .filter { case (_, cs) => cs.length >= 2 &&
          cs.forall(c => block.schema(c).dataType.isInstanceOf[ArrayType]) }
      for ((p, cs) <- groups) {
        val mismatch = cs.tail.map(c =>
          fsize(fcol(s"`${cs.head}`")) =!= fsize(fcol(s"`$c`"))).reduce(_ || _)
        if (!block.filter(mismatch).isEmpty)
          throw new IllegalArgumentException(
            s"SIZES_OF_ARRAYS_DONT_MATCH: elements of Nested data structure " +
              s"'$p' have different array sizes")
      }
    }
  }

  /** Push one inserted block through every materialized view on `src`
    * (reference StorageMaterializedView: the MV SELECT runs over the
    * inserted block, its result appends to the view's storage). */
  private def propagateMatViews(spark: SparkSession, dir: String,
                                src: String, block: DataFrame): Unit =
    for ((mv, sel) <- matViews.getOrElse(src, Nil)
         if spark.catalog.tableExists(mv)) {
      val batchName = s"__mv_block_$src"
      block.createOrReplaceTempView(batchName)
      val transformed = sql(spark, dir, ("(?i)\\bFROM\\s+" +
        java.util.regex.Pattern.quote(src) + "\\b").r
        .replaceAllIn(sel, s"FROM $batchName"))
      val appended = spark.table(mv).unionByName(transformed).persist()
      appended.count()
      appended.createOrReplaceTempView(mv)
      spark.catalog.dropTempView(batchName)
    }

  /** Named custom TLD lists for the *Custom URL-subdomain functions
    * (reference: the top_level_domains_lists server configuration that
    * cutToFirstSignificantSubdomainCustom() et al consult). */
  private val tldLists =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]
  def registerTldList(name: String, suffixes: Seq[String]): Unit =
    tldLists(name) = suffixes

  /** Stable per-process serverUUID() value (reference: the UUID the
    * server generates on first start and persists). */
  private lazy val serverUuid: String = java.util.UUID.randomUUID().toString

  /** Register a SQL lambda UDF for all subsequent `sql`/`rewrite` calls.
    * Returns the function name. */
  def createFunction(ddl: String): String = {
    val m = createFnPattern.matcher(ddl)
    require(m.find(), s"not a CREATE FUNCTION statement: $ddl")
    val params =
      if (m.group(2) != null) splitArgs(m.group(2)).filter(_.nonEmpty)
      else Seq(m.group(3))
    registeredFns.put(m.group(1), (params, m.group(4)))
    m.group(1)
  }

  def dropFunction(name: String): Unit = registeredFns.remove(name)

  /** Expand macro calls (session-registered + any CREATE FUNCTION
    * statements prefixed to the query itself). */
  private def expandMacros(sql: String): String = {
    var q = sql
    val local = scala.collection.mutable.Map.empty[String, (Seq[String], String)]
    val m = createFnPattern.matcher(q)
    while (m.find()) {
      val params =
        if (m.group(2) != null) splitArgs(m.group(2)).filter(_.nonEmpty)
        else Seq(m.group(3))
      local.put(m.group(1), (params, m.group(4)))
    }
    q = createFnPattern.matcher(q).replaceAll("")
    val fns = registeredFns.toMap ++ local
    var rounds = 0
    var changed = true
    while (changed && rounds < 10) {
      changed = false
      for ((name, (params, body)) <- fns) {
        val before = q
        q = rewriteCalls(q, name) { args =>
          var b = body
          params.zip(args).foreach { case (p, a) =>
            b = b.replaceAll("\\b" + java.util.regex.Pattern.quote(p) + "\\b",
              java.util.regex.Matcher.quoteReplacement(s"($a)"))
          }
          s"($b)"
        }
        if (q != before) changed = true
      }
      rounds += 1
    }
    q
  }

  /** Apply all rewrites to a ClickHouse-flavoured SELECT. */
  /** Round-10 batch 29: the aggregate alias/spelling tail of the
    * reference's registerAggregateFunctions.cpp — median* spellings of
    * the quantile family, NULL-handling variants of any/anyLast,
    * approx_top_*, the sumMap spelling family, matrix covariance, and
    * sample skew/kurtosis. The weighted-quantile and top-N spellings are
    * single-expression HOF scans over the group's collected values —
    * exact per the reference algorithms (QuantileExactWeighted: threshold
    * ceil(level*W), accumulated>=threshold; InterpolatedWeighted: the
    * Wikipedia weighted-percentile method over distinct values), meant
    * for bounded group sizes; the scale path for huge groups is the
    * two-phase running-total formulation in queries/Aggregates7. */
  private def rewriteAggSpellings(q0: String): String = {
    var q = q0
    // argMin/argMax -Array combinator (reference
    // AggregateFunctionArray.h over argMin): the aggregate runs over the
    // ELEMENTS of the array arguments across the group — zip the arrays
    // per row, flatten across the group, pick the row at the extreme key
    // (first occurrence on ties, as the reference does).
    def argArr(vx: String, ky: String, maxSide: Boolean): String = {
      val pairs = s"flatten(collect_list(zip_with($vx, $ky, " +
        s"(__av, __ak) -> named_struct('v', __av, 'k', __ak))))"
      val keyAgg = if (maxSide) s"array_max(flatten(collect_list($ky)))"
        else s"array_min(flatten(collect_list($ky)))"
      val cmp = if (maxSide) ">=" else "<="
      s"element_at(filter($pairs, __as -> __as.k $cmp $keyAgg), 1).v"
    }
    q = rewriteCalls(q, "argMinArray")(a => argArr(a(0), a(1), maxSide = false))
    q = rewriteCalls(q, "argMaxArray")(a => argArr(a(0), a(1), maxSide = true))

    // -State / -Merge two-level aggregation (reference
    // AggregateFunctionState.h / AggregateFunctionMerge.h): algebraic
    // aggregates' state IS their value (merge = re-aggregate); count
    // states merge by summing; avg keeps a (sum, count) pair; exact-set
    // states are arrays merged by flatten+distinct; uniq rides the real
    // mergeable KMV state (uniq_theta_state / uniq_theta_merge).
    for ((st, fn) <- Seq("sumState" -> "sum", "minState" -> "min",
        "maxState" -> "max"))
      q = rewriteCalls(q, st)(a => s"$fn(${a(0)})")
    for ((mg, fn) <- Seq("sumMerge" -> "sum", "minMerge" -> "min",
        "maxMerge" -> "max"))
      q = rewriteCalls(q, mg)(a => s"$fn(${a(0)})")
    q = rewriteCalls(q, "countState")(a =>
      if (a.forall(_.trim.isEmpty)) "count(1)" else s"count(${a(0)})")
    q = rewriteCalls(q, "countMerge")(a => s"CAST(sum(${a(0)}) AS BIGINT)")
    q = rewriteCalls(q, "avgState")(a =>
      s"named_struct('s', sum(CAST(${a(0)} AS DOUBLE)), 'c', count(${a(0)}))")
    q = rewriteCalls(q, "avgMerge")(a =>
      s"(sum((${a(0)}).s) / sum((${a(0)}).c))")
    q = rewriteCalls(q, "groupArrayState")(a => s"collect_list(${a(0)})")
    q = rewriteCalls(q, "groupArrayMerge")(a =>
      s"flatten(collect_list(${a(0)}))")
    q = rewriteCalls(q, "uniqExactState")(a => s"collect_set(${a(0)})")
    q = rewriteCalls(q, "uniqExactMerge")(a =>
      s"CAST(size(array_distinct(flatten(collect_list(${a(0)})))) AS BIGINT)")
    // -MergeState keeps the merged result a STATE (00208):
    // finalizeAggregation then estimates it
    q = rewriteCalls(q, "uniqMergeState")(a =>
      s"uniq_theta_merge_state(${a(0)})")
    q = rewriteCalls(q, "uniqState")(a => s"uniq_theta_state(${a(0)})")
    q = rewriteCalls(q, "uniqMerge")(a => s"CAST(uniq_theta_merge(${a(0)}) AS BIGINT)")
    q = rewriteCalls(q, "uniqThetaMerge")(a => s"CAST(uniq_theta_merge(${a(0)}) AS BIGINT)")
    // states whose value IS the state (argMax/argMin/-SimpleState/any)
    q = rewriteCalls(q, "groupUniqArrayState")(a => s"collect_set(${a(0)})")
    q = rewriteCalls(q, "argMaxState")(a => s"max_by(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "argMinState")(a => s"min_by(${a(0)}, ${a(1)})")
    // value-is-state merge: the stored argMax/argMin state is the value
    // itself (ordering column not retained), so merging keeps the
    // extremal stored value (aggregate_functions_deserialization.xml)
    q = rewriteCalls(q, "argMaxMerge")(a => s"max(${a(0)})")
    q = rewriteCalls(q, "argMinMerge")(a => s"min(${a(0)})")
    for ((n, fn) <- Seq("minSimpleState" -> "min", "maxSimpleState" -> "max",
        "sumSimpleState" -> "sum", "sumWithOverflowSimpleState" -> "sum"))
      q = rewriteCalls(q, n)(a => s"$fn(${a(0)})")
    q = rewriteCalls(q, "anySimpleState")(a => s"first(${a(0)}, true)")
    q = rewriteCalls(q, "anyLastSimpleState")(a => s"last(${a(0)}, true)")
    for (n <- Seq("any_respect_nullsState", "anyRespectNullsState",
        "any_value_respect_nullsState", "first_value_respect_nullsState"))
      q = rewriteCalls(q, n)(a => s"first(${a(0)})")

    // ---- r15 statistics/sweep-line aggregate spellings ----
    // (reference AggregateFunctionMaxIntersections.h, IntervalLengthSum.cpp,
    // Entropy.h, RankCorrelation.cpp + StatCommon.h, CrossTab.h +
    // CramersV/TheilsU/ContingencyCoefficient.cpp,
    // CategoricalInformationValue.cpp). All are formulated as
    // collect_list + array HOFs so they work in any GROUP BY context;
    // float edge semantics (x/0 -> ±Inf, 0/0 -> NaN, ln(0) -> -Inf)
    // follow the reference's raw IEEE arithmetic, which Spark's NULL-on-
    // zero-division would otherwise lose.
    locally {
      def D(x: String) = s"CAST($x AS DOUBLE)"
      def chdiv(a: String, b: String) =
        s"(CASE WHEN ($b) = 0.0 THEN (CASE WHEN ($a) > 0.0 THEN CAST('Infinity' AS DOUBLE) " +
          s"WHEN ($a) < 0.0 THEN CAST('-Infinity' AS DOUBLE) ELSE CAST('NaN' AS DOUBLE) END) " +
          s"ELSE ($a) / ($b) END)"
      def chln(x: String) =
        s"(CASE WHEN ($x) > 0.0 THEN ln($x) WHEN ($x) = 0.0 THEN CAST('-Infinity' AS DOUBLE) " +
          s"WHEN ($x) < 0.0 THEN CAST('NaN' AS DOUBLE) ELSE ($x) END)"
      // sweep events: (+1 at start, -1 at end), sorted by (pos, delta) so
      // ends close BEFORE starts open at the same point — (1,3),(3,5)
      // never intersect (00671 pins this)
      def sweepEvents(s: String, e: String) =
        s"array_sort(concat(collect_list(named_struct('p', ${D(s)}, 'd', 1)), " +
          s"collect_list(named_struct('p', ${D(e)}, 'd', -1))))"
      q = rewriteCalls(q, "maxIntersectionsPosition")(a =>
        s"aggregate(${sweepEvents(a(0), a(1))}, " +
          "named_struct('c', 0, 'm', 0, 'p', CAST(NULL AS DOUBLE)), " +
          "(__ac, __ev) -> named_struct('c', __ac.c + __ev.d, " +
          "'m', GREATEST(__ac.m, __ac.c + __ev.d), " +
          "'p', CASE WHEN __ac.c + __ev.d > __ac.m THEN __ev.p ELSE __ac.p END), " +
          "__ac -> CAST(__ac.p AS BIGINT))")
      q = rewriteCalls(q, "maxIntersections")(a =>
        s"aggregate(${sweepEvents(a(0), a(1))}, named_struct('c', 0, 'm', 0), " +
          "(__ac, __ev) -> named_struct('c', __ac.c + __ev.d, " +
          "'m', GREATEST(__ac.m, __ac.c + __ev.d)), " +
          "__ac -> CAST(__ac.m AS BIGINT))")
      // union length of merged intervals; reversed pairs count by |len|,
      // zero-length pairs are skipped (collect_list drops the NULLs)
      q = rewriteCalls(q, "intervalLengthSum")(a =>
        s"transform(array(array_sort(collect_list(CASE " +
          s"WHEN ${D(a(1))} < ${D(a(0))} THEN named_struct('s', ${D(a(1))}, 'e', ${D(a(0))}) " +
          s"WHEN ${D(a(1))} = ${D(a(0))} THEN CAST(NULL AS STRUCT<s: DOUBLE, e: DOUBLE>) " +
          s"ELSE named_struct('s', ${D(a(0))}, 'e', ${D(a(1))}) END))), " +
          "__ivs -> aggregate(__ivs, " +
          "named_struct('cov', CAST(0 AS DOUBLE), 'hi', CAST('-Infinity' AS DOUBLE)), " +
          "(__ac, __iv) -> named_struct(" +
          "'cov', __ac.cov + GREATEST(CAST(0 AS DOUBLE), __iv.e - GREATEST(__iv.s, __ac.hi)), " +
          "'hi', GREATEST(__ac.hi, __iv.e)), __ac -> __ac.cov))[0]")
      // Shannon entropy of the value distribution (log2); multi-arg =
      // entropy of the tuple — values key on their string rendering
      q = rewriteCalls(q, "entropy") { a =>
        val v =
          if (a.length == 1) s"CAST(${a(0)} AS STRING)"
          else s"CAST(named_struct(${a.zipWithIndex.map { case (x, i) => s"'c$i', $x" }.mkString(", ")}) AS STRING)"
        s"transform(array(collect_list($v)), __xs -> " +
          "aggregate(array_distinct(__xs), CAST(0 AS DOUBLE), (__ac, __v) -> __ac + " +
          "(size(filter(__xs, __u -> __u = __v)) / CAST(size(__xs) AS DOUBLE)) * " +
          "log2(size(filter(__xs, __u -> __u = __v)) / CAST(size(__xs) AS DOUBLE)), " +
          "__ac -> -__ac))[0]"
      }
      // Spearman: 1 - 6*sum(d^2)/(n(n^2-1)) over midranks; NaN inputs are
      // skipped per column (02347: all-NaN side -> n=0 -> 0/0 -> nan)
      q = rewriteCalls(q, "rankCorr") { a =>
        def rank(arr: String, v: String) =
          s"(size(filter($arr, __w -> __w < $v)) + (size(filter($arr, __w -> __w = $v)) + 1) / 2.0)"
        val sumd2 = "aggregate(filter(__t.ps, __p -> NOT isnan(__p.x) AND NOT isnan(__p.y)), " +
          "CAST(0 AS DOUBLE), (__ac, __p) -> __ac + " +
          s"pow(${rank("__t.xs", "__p.x")} - ${rank("__t.ys", "__p.y")}, 2), __ac -> __ac)"
        val n = "CAST(least(size(__t.xs), size(__t.ys)) AS DOUBLE)"
        s"transform(array(collect_list(named_struct('x', ${D(a(0))}, 'y', ${D(a(1))}))), __ps -> " +
          "transform(array(named_struct(" +
          "'xs', filter(transform(__ps, __p -> __p.x), __v -> NOT isnan(__v)), " +
          "'ys', filter(transform(__ps, __p -> __p.y), __v -> NOT isnan(__v)), " +
          "'ps', __ps)), __t -> " +
          s"1 - ${chdiv(s"6 * $sumd2", s"$n * ($n * $n - 1)")})[0])[0]"
      }
      // categoricalInformationValue(x1..xn, y): per feature i,
      // (no_i/sum_no - yes_i/sum_yes) * ln((no_i/sum_no)/(yes_i/sum_yes))
      q = rewriteCalls(q, "categoricalInformationValue") { a =>
        val y = a.last
        def cnt(cond: String) = s"CAST(coalesce(sum(CASE WHEN $cond THEN 1 ELSE 0 END), 0) AS DOUBLE)"
        val sumNo = cnt(s"CAST($y AS INT) = 0")
        val sumYes = cnt(s"CAST($y AS INT) <> 0")
        val elems = a.dropRight(1).map { x =>
          val no = cnt(s"CAST($x AS INT) <> 0 AND CAST($y AS INT) = 0")
          val yes = cnt(s"CAST($x AS INT) <> 0 AND CAST($y AS INT) <> 0")
          val rNo = chdiv(no, sumNo)
          val rYes = chdiv(yes, sumYes)
          s"(($rNo - $rYes) * ${chln(chdiv(rNo, rYes))})"
        }
        s"array(${elems.mkString(", ")})"
      }
      // cross-tab statistics (CrossTab.h): counts keyed on string-
      // rendered values; phi^2 = chi^2 / n
      def crossTab(a0: String, b0: String)(body: String): String = {
        // array/map literals are NOT_IMPLEMENTED argument types in the
        // reference's cross-tab aggregates (02419)
        if (Seq(a0, b0).exists(x =>
            x.trim.startsWith("[") || x.trim.startsWith("array(")))
          throw new IllegalArgumentException(
            "NOT_IMPLEMENTED: cross-tab statistics over array arguments")
        s"transform(array(collect_list(named_struct('a', CAST($a0 AS STRING), 'b', CAST($b0 AS STRING)))), __ps -> " +
          "transform(array(named_struct('n', CAST(size(__ps) AS DOUBLE), " +
          "'da', array_distinct(transform(__ps, __p -> __p.a)), " +
          "'db', array_distinct(transform(__ps, __p -> __p.b)), " +
          "'dab', array_distinct(__ps))), __t -> " +
          s"CASE WHEN __t.n < 2 THEN CAST('NaN' AS DOUBLE) ELSE $body END)[0])[0]"
      }
      def ca(v: String) = s"CAST(size(filter(__ps, __r -> __r.a = $v)) AS DOUBLE)"
      def cb(v: String) = s"CAST(size(filter(__ps, __r -> __r.b = $v)) AS DOUBLE)"
      val phi2 = "(aggregate(__t.dab, CAST(0 AS DOUBLE), (__ac, __q) -> __ac + " +
        s"pow(size(filter(__ps, __r -> __r.a = __q.a AND __r.b = __q.b)) - ${ca("__q.a")} * ${cb("__q.b")} / __t.n, 2) / " +
        s"(${ca("__q.a")} * ${cb("__q.b")} / __t.n), __ac -> __ac) / __t.n)"
      q = rewriteCalls(q, "cramersVBiasCorrected")(a => crossTab(a(0), a(1)) {
        val adj = s"GREATEST(CAST(0 AS DOUBLE), $phi2 - " +
          "(size(__t.da) - 1) * CAST(size(__t.db) - 1 AS DOUBLE) / (__t.n - 1))"
        val corrA = "(size(__t.da) - pow(size(__t.da) - 1, 2) / (__t.n - 1))"
        val corrB = "(size(__t.db) - pow(size(__t.db) - 1, 2) / (__t.n - 1))"
        s"sqrt(${chdiv(adj, s"least($corrA, $corrB) - 1")})"
      })
      q = rewriteCalls(q, "cramersV")(a => crossTab(a(0), a(1)) {
        s"sqrt(${chdiv(phi2, "CAST(least(size(__t.da), size(__t.db)) - 1 AS DOUBLE)")})"
      })
      q = rewriteCalls(q, "contingency")(a => crossTab(a(0), a(1)) {
        s"sqrt(${chdiv(phi2, s"$phi2 + __t.n")})"
      })
      // theilsU: numerator computed in the DISTRIBUTED form
      // sum_ab (cab/n)(ln(cab/cb) - ln(ca/n)) so the independent case
      // cancels exactly per term (0 / negative h_a then renders -0,
      // matching the reference)
      q = rewriteCalls(q, "theilsU")(a => crossTab(a(0), a(1)) {
        def cab = "CAST(size(filter(__ps, __r -> __r.a = __q.a AND __r.b = __q.b)) AS DOUBLE)"
        val num = "aggregate(__t.dab, CAST(0 AS DOUBLE), (__ac, __q) -> __ac + " +
          s"($cab / __t.n) * (${chln(chdiv(cab, cb("__q.b")))} - ${chln(chdiv(ca("__q.a"), "__t.n"))}), " +
          "__ac -> __ac)"
        val hA = "aggregate(__t.da, CAST(0 AS DOUBLE), (__ac, __v) -> __ac + " +
          s"(${ca("__v")} / __t.n) * ${chln(chdiv(ca("__v"), "__t.n"))}, __ac -> __ac)"
        chdiv(num, hA)
      })
      // bitmap states are sorted distinct arrays (same representation as
      // bitmapBuild); And/Or/Xor fold the collected states
      q = rewriteCalls(q, "groupBitmapState") { a =>
        // the reference rejects Nullable inputs (ILLEGAL_TYPE_OF_ARGUMENT,
        // 03457); a NULL literal or Nullable cast in the argument is the
        // textual signature of that shape
        if ("(?i)\\bNULL\\b|Nullable\\s*\\(|toNullable\\s*\\(|try_cast\\s*\\(|\\w+OrNull\\s*\\(".r.findFirstIn(a(0)).isDefined)
          throw new IllegalArgumentException(
            "ILLEGAL_TYPE_OF_ARGUMENT: groupBitmapState over a Nullable input")
        s"array_sort(collect_set(${a(0)}))"
      }
      q = rewriteCalls(q, "groupBitmapMerge")(a =>
        s"CAST(size(array_distinct(flatten(collect_list(${a(0)})))) AS BIGINT)")
      def bitmapFold(st: String, op: (String, String) => String): String =
        s"transform(array(collect_list($st)), __bs -> " +
          s"CASE WHEN size(__bs) = 0 THEN slice(flatten(__bs), 1, 0) " +
          s"ELSE aggregate(slice(__bs, 2, size(__bs)), __bs[0], " +
          s"(__ac, __x) -> ${op("__ac", "__x")}) END)[0]"
      val andOp = (a: String, b: String) => s"array_intersect($a, $b)"
      val orOp = (a: String, b: String) => s"array_union($a, $b)"
      val xorOp = (a: String, b: String) =>
        s"array_except(array_union($a, $b), array_intersect($a, $b))"
      // -MergeState: merge the states, KEEP the state (= the Or-fold)
      q = rewriteCalls(q, "groupBitmapMergeState")(a => s"array_sort(${bitmapFold(a(0), orOp)})")
      q = rewriteCalls(q, "groupBitmapAndState")(a => s"array_sort(${bitmapFold(a(0), andOp)})")
      q = rewriteCalls(q, "groupBitmapOrState")(a => s"array_sort(${bitmapFold(a(0), orOp)})")
      q = rewriteCalls(q, "groupBitmapXorState")(a => s"array_sort(${bitmapFold(a(0), xorOp)})")
      q = rewriteCalls(q, "groupBitmapAnd")(a => s"CAST(size(${bitmapFold(a(0), andOp)}) AS BIGINT)")
      q = rewriteCalls(q, "groupBitmapOr")(a => s"CAST(size(${bitmapFold(a(0), orOp)}) AS BIGINT)")
      q = rewriteCalls(q, "groupBitmapXor")(a => s"CAST(size(${bitmapFold(a(0), xorOp)}) AS BIGINT)")
      // -Array combinators: the aggregate over all elements of all arrays
      q = rewriteCalls(q, "sumArray")(a =>
        s"coalesce(sum(aggregate(${a(0)}, CAST(0 AS DOUBLE), (__a, __b) -> __a + __b)), CAST(0 AS DOUBLE))")
      q = rewriteCalls(q, "minArray")(a => s"min(array_min(${a(0)}))")
      q = rewriteCalls(q, "maxArray")(a => s"max(array_max(${a(0)}))")
      q = rewriteCalls(q, "avgArray")(a =>
        s"(sum(aggregate(${a(0)}, CAST(0 AS DOUBLE), (__a, __b) -> __a + __b)) / sum(size(${a(0)})))")
      q = rewriteCalls(q, "countArray")(a => s"CAST(sum(size(${a(0)})) AS BIGINT)")
      // multi-arg -Array combinators aggregate over ZIPPED element
      // tuples (00533: uniqArray([0,1,1],[0,1,1],[0,1,0]) = 3)
      def zippedArr(a: Seq[String]): String =
        if (a.length == 1) a(0) else s"arrays_zip(${a.mkString(", ")})"
      q = rewriteCalls(q, "uniqArray")(a =>
        s"CAST(size(array_distinct(flatten(collect_list(${zippedArr(a)})))) AS BIGINT)")
      q = rewriteCalls(q, "groupUniqArrayArray")(a =>
        s"array_distinct(flatten(collect_list(${a(0)})))")
      q = rewriteCalls(q, "groupArrayArrayState")(a => s"flatten(collect_list(${a(0)}))")
      q = rewriteCalls(q, "groupArrayArrayMerge")(a => s"flatten(collect_list(${a(0)}))")
      q = rewriteCalls(q, "uniqExactArray")(a =>
        s"CAST(size(array_distinct(flatten(collect_list(${zippedArr(a)})))) AS BIGINT)")
      // -Merge on groupUniqArray states (states ARE the arrays here)
      q = rewriteCalls(q, "groupUniqArrayMerge")(a =>
        s"array_distinct(flatten(collect_list(${a(0)})))")
      // uniqUpTo(K)(x..) (AggregateFunctionUniqUpTo.h): exact distinct
      // count capped at K — answers K+1 as soon as more than K are seen
      q = rewriteParamCalls(q, "uniqUpTo")((p, a) =>
        s"least(count(DISTINCT ${a.mkString(", ")}), CAST(${p(0)} AS BIGINT) + 1)")
      q = rewriteParamCalls(q, "uniqUpToArray")((p, a) => {
        val flatTuples =
          if (a.length == 1) s"flatten(collect_list(${a(0)}))"
          else s"flatten(collect_list(arrays_zip(${a.mkString(", ")})))"
        s"least(CAST(size(array_distinct($flatTuples)) AS BIGINT), " +
          s"CAST(${p(0)} AS BIGINT) + 1)"
      })
      // -ForEach combinator (AggregateFunctionForEach.cpp): elementwise
      // aggregation across the group's arrays; result length = LONGEST
      // array, each slot aggregating only the arrays long enough
      locally {
        def forEachT(agg: String => String): Seq[String] => String = a => {
          val lst = s"collect_list(${a(0)})"
          val slot = s"filter(transform($lst, __fa -> (CASE WHEN " +
            s"size(__fa) >= __fi THEN element_at(__fa, __fi) END)), " +
            s"__fv -> __fv IS NOT NULL)"
          s"transform(sequence(1, array_max(transform($lst, __fa -> size(__fa)))), " +
            s"__fi -> ${agg(slot)})"
        }
        q = rewriteCalls(q, "sumForEach")(forEachT(s =>
          s"aggregate($s, CAST(0 AS BIGINT), (__acc, __v) -> __acc + __v)"))
        q = rewriteCalls(q, "minForEach")(forEachT(s => s"array_min($s)"))
        q = rewriteCalls(q, "maxForEach")(forEachT(s => s"array_max($s)"))
        q = rewriteCalls(q, "avgForEach")(forEachT(s =>
          s"(aggregate($s, CAST(0 AS DOUBLE), (__acc, __v) -> __acc + __v) / size($s))"))
        q = rewriteCalls(q, "countForEach")(forEachT(s =>
          s"CAST(size($s) AS BIGINT)"))
        q = rewriteCalls(q, "groupArrayForEach")(forEachT(identity))
        q = rewriteCalls(q, "uniqForEach")(forEachT(s =>
          s"CAST(size(array_distinct($s)) AS BIGINT)"))
        q = rewriteCalls(q, "uniqExactForEach")(forEachT(s =>
          s"CAST(size(array_distinct($s)) AS BIGINT)"))
        // -ForEachIf: the condition gates whole ARRAYS (00544)
        q = rewriteCalls(q, "sumForEachIf")(a =>
          forEachT(s =>
            s"aggregate($s, CAST(0 AS BIGINT), (__acc, __v) -> __acc + __v)")(
            Seq(s"CASE WHEN ${a.last} THEN ${a(0)} END")))
        q = rewriteCalls(q, "minForEachIf")(a =>
          forEachT(s => s"array_min($s)")(
            Seq(s"CASE WHEN ${a.last} THEN ${a(0)} END")))
        q = rewriteCalls(q, "maxForEachIf")(a =>
          forEachT(s => s"array_max($s)")(
            Seq(s"CASE WHEN ${a.last} THEN ${a(0)} END")))
        // -IfForEach: an ARRAY condition gates elementwise (00544)
        for ((n, fn) <- Seq(
            "sumIfForEach" -> ((s: String) =>
              s"aggregate($s, CAST(0 AS BIGINT), (__acc, __v) -> __acc + __v)"),
            "minIfForEach" -> ((s: String) => s"array_min($s)"),
            "maxIfForEach" -> ((s: String) => s"array_max($s)"),
            "countIfForEach" -> ((s: String) => s"CAST(size($s) AS BIGINT)")))
          q = rewriteCalls(q, n)(a => forEachT(fn)(Seq(
            s"zip_with(${a(0)}, ${a(1)}, (__zv, __zc) -> " +
              "CASE WHEN __zc THEN __zv END)")))
        // quantilesExactForEach(p...)(arr): per-slot exact quantiles
        // (00447) — result[i] = [q_p(slot_i) for each p]; QuantileExact
        // takes sorted[floor(p * n)] (reference QuantileExact.h)
        q = rewriteParamCalls(q, "quantilesExactForEach")((p, a) =>
          forEachT(s =>
            "array(" + p.map(l =>
              s"element_at(array_sort($s), LEAST(CAST(floor(($l) * size($s)) AS INT) + 1, size($s)))")
              .mkString(", ") + ")")(a))
      }
      // remaining simple combinator spellings: -If on groupUniqArray
      // (collect_set drops the CASE's null misses), -OrNull on count
      // (NULL instead of 0 on an empty set)
      q = rewriteCalls(q, "groupUniqArrayIf")(a =>
        s"collect_set(CASE WHEN ${a.last} THEN ${a.dropRight(1).mkString(", ")} END)")
      q = rewriteCalls(q, "countOrNull")(a =>
        if (a.isEmpty || a.forall(_.trim.isEmpty)) "nullif(count(1), 0)"
        else s"nullif(count(${a(0)}), 0)")
      q = rewriteCalls(q, "sumOrNull")(a =>
        s"(CASE WHEN count(${a(0)}) > 0 THEN sum(${a(0)}) END)")
      // CH transform(x, from, to[, default]): value mapping through
      // parallel arrays, first match wins, else default (4-arg) or x
      // itself (3-arg). Spark's own transform(arr, lambda) keeps its
      // 2-arg HOF form untouched.
      q = rewriteCalls(q, "transform") { a =>
        if (a.length < 3) s"transform(${a.mkString(", ")})"
        else if (a.length == 3 && "(?i)\\bnull\\b".r.findFirstIn(a(2)).isDefined)
          // 3-arg transform keeps x's type; a NULL in the to-array makes
          // that type unsatisfiable (ILLEGAL_TYPE_OF_ARGUMENT, 02542)
          throw new IllegalArgumentException(
            "ILLEGAL_TYPE_OF_ARGUMENT: transform(x, from, to) with NULL in to")
        else if (a.exists(x => "(?is)\\(\\s*SELECT\\b".r.findFirstIn(x).isDefined)) {
          // subquery-built arrays cannot appear inside lambdas — use the
          // map_from_arrays form (02800_transform_alter; assumes the
          // from-array has no duplicates, which a groupArray over
          // distinct keys satisfies)
          val dflt = if (a.length >= 4) a(3) else a(0)
          s"coalesce(element_at(map_from_arrays(${a(1)}, ${a(2)}), ${a(0)}), $dflt)"
        } else {
          val dflt = if (a.length >= 4) a(3) else a(0)
          s"coalesce(get(transform(filter(zip_with(${a(1)}, ${a(2)}, " +
            s"(__f, __t) -> named_struct('f', __f, 't', __t)), " +
            s"__p -> __p.f <=> (${a(0)})), __p -> __p.t), 0), $dflt)"
        }
      }
      q = rewriteCalls(q, "sumArrayIf")(a =>
        s"coalesce(sum(CASE WHEN ${a(1)} THEN " +
          s"aggregate(${a(0)}, CAST(0 AS DOUBLE), (__a, __b) -> __a + __b) END), CAST(0 AS DOUBLE))")
      // values('c1 T1, c2 T2', row, row...) TABLE function: the schema
      // string names and types the columns (reference
      // TableFunctionValues.cpp); plain VALUES lists pass through
      // the TVF name is case-insensitive in the reference (02016 writes
      // FROM Values('x UInt64, ...')) — canonicalize the FROM-clause
      // spelling only (an INSERT's VALUES keyword must stay untouched)
      q = q.replaceAll("(?i)(\\bFROM\\s+)VALUES(\\s*\\(\\s*')", "$1values$2")
      q = rewriteCalls(q, "values") { a =>
        val schema = a.headOption.map(_.trim).getOrElse("")
        if (a.length >= 2 && schema.matches("(?s)'\\s*[A-Za-z_]\\w*\\s+[A-Za-z].*'")) {
          val cols = splitArgs(schema.stripPrefix("'").stripSuffix("'"))
            .map(_.trim).map { cd =>
              val sp = cd.indexOf(' ')
              val n = cd.substring(0, sp).trim
              val t = try ChTypes.toSpark(cd.substring(sp + 1).trim).sql
                catch { case _: Exception => "STRING" }
              (n, t)
            }
          val sel = cols.zipWithIndex.map { case ((n, t), i) =>
            s"CAST(col${i + 1} AS $t) AS `$n`" }.mkString(", ")
          s"(SELECT $sel FROM (VALUES ${a.drop(1).mkString(", ")}))"
        } else s"values(${a.mkString(", ")})"
      }
    }
    // any/anyValue/anyLast SKIP NULLs in the reference (Nullable inputs
    // route through AggregateFunctionNull) — Spark's first/last need the
    // explicit ignoreNulls flag. The *RespectNulls spellings are plain
    // aliases (Spark's default already respects NULLs).
    q = rewriteCalls(q, "anyValue")(a => s"first(${a(0)}, true)")
    q = rewriteCalls(q, "any_value")(a => s"first(${a(0)}, true)")
    q = rewriteCalls(q, "anyLast")(a => s"last(${a(0)}, true)")
    q = rewriteCalls(q, "any")(a => s"first(${a(0)}, true)")

    // median* = quantile*(0.5) (AggregateFunctionQuantile.cpp)
    q = rewriteCalls(q, "medianDeterministic")(a =>
      s"percentile_approx(${a(0)}, 0.5)")
    for (n <- Seq("medianTDigestWeighted", "medianBFloat16Weighted"))
      q = rewriteCalls(q, n)(a =>
        s"percentile(${a(0)}, 0.5, CAST(${a(1)} AS BIGINT))")
    // medianTiming[Weighted] keep the QuantileTiming value semantics —
    // rewritten with the timing templates further down, NOT here
    for (n <- Seq("medianTDigest", "medianBFloat16", "median"))
      q = rewriteCalls(q, n)(a => s"percentile_approx(${a(0)}, 0.5)")
    q = rewriteParamCalls(q, "medianGK")((p, a) =>
      s"approx_percentile(${a(0)}, 0.5, ${p(0)})")
    q = rewriteParamCalls(q, "medianDD")((p, a) =>
      if (p.headOption.exists(_.trim == "0.01")) s"quantile_dd_50(${a(0)})"
      else s"percentile_approx(${a(0)}, 0.5)")

    // quantileExactLow/High (QuantileExact.h: median by index rounding;
    // other levels truncate level*size, capped at size-1)
    def exactLH(level: String, x: String, high: Boolean): String = {
      val arr = s"array_sort(collect_list($x))"
      val idx =
        if (level.trim.toDouble == 0.5) {
          if (high) s"CAST(floor(size($arr) / 2) AS INT)"
          else s"IF(size($arr) % 2 = 1, CAST(floor(size($arr) / 2) AS INT), " +
            s"CAST(size($arr) / 2 - 1 AS INT))"
        } else s"LEAST(CAST(floor(($level) * size($arr)) AS INT), size($arr) - 1)"
      s"element_at($arr, $idx + 1)"
    }
    q = rewriteParamCalls(q, "quantileExactLow")((p, a) => exactLH(p(0), a(0), high = false))
    q = rewriteParamCalls(q, "quantileExactHigh")((p, a) => exactLH(p(0), a(0), high = true))
    q = rewriteCalls(q, "quantileExactLow")(a => exactLH("0.5", a(0), high = false))
    q = rewriteCalls(q, "quantileExactHigh")(a => exactLH("0.5", a(0), high = true))
    q = rewriteCalls(q, "medianExactLow")(a => exactLH("0.5", a(0), high = false))
    q = rewriteCalls(q, "medianExactHigh")(a => exactLH("0.5", a(0), high = true))
    q = rewriteParamCalls(q, "quantilesExactLow")((p, a) =>
      "array(" + p.map(l => exactLH(l, a(0), high = false)).mkString(", ") + ")")
    q = rewriteParamCalls(q, "quantilesExactHigh")((p, a) =>
      "array(" + p.map(l => exactLH(l, a(0), high = true)).mkString(", ") + ")")

    // quantileExactWeighted (AggregateFunctionQuantileExactWeighted.cpp:
    // threshold = ceil(level * sum_weight); first sorted value whose
    // accumulated weight reaches it)
    def exactW(level: String, x: String, w: String): String = {
      val arr = s"array_sort(collect_list(named_struct('x', CAST($x AS DOUBLE), 'w', CAST($w AS DOUBLE))))"
      s"aggregate($arr, named_struct('cum', CAST(0 AS DOUBLE), 'ans', CAST(NULL AS DOUBLE)), " +
        s"(__wa, __ws) -> named_struct('cum', __wa.cum + __ws.w, " +
        s"'ans', coalesce(__wa.ans, IF(__wa.cum + __ws.w >= ceil(($level) * sum(CAST($w AS DOUBLE))), __ws.x, CAST(NULL AS DOUBLE)))), " +
        s"__wa -> __wa.ans)"
    }
    q = rewriteParamCalls(q, "quantileExactWeighted")((p, a) => exactW(p(0), a(0), a(1)))
    q = rewriteCalls(q, "quantileExactWeighted")(a => exactW("0.5", a(0), a(1)))
    q = rewriteCalls(q, "medianExactWeighted")(a => exactW("0.5", a(0), a(1)))

    // quantileInterpolatedWeighted (the Wikipedia weighted-percentile
    // method, AggregateFunctionQuantileInterpolatedWeighted.cpp):
    // distinct values at positions h_i = cum_i - w_i/2, linear
    // interpolation between the bracketing positions of level*W.
    def interpW(level: String, x: String, w: String): String = {
      val arr = s"array_sort(collect_list(named_struct('x', CAST($x AS DOUBLE), 'w', CAST($w AS DOUBLE))))"
      val merged = s"aggregate($arr, CAST(array() AS ARRAY<STRUCT<x: DOUBLE, w: DOUBLE>>), " +
        s"(__ma, __ms) -> IF(size(__ma) > 0 AND element_at(__ma, -1).x = __ms.x, " +
        s"concat(slice(__ma, 1, size(__ma) - 1), array(named_struct('x', __ms.x, 'w', element_at(__ma, -1).w + __ms.w))), " +
        s"concat(__ma, array(__ms))))"
      val pp = s"aggregate($merged, named_struct('cum', CAST(0 AS DOUBLE), 'out', CAST(array() AS ARRAY<STRUCT<x: DOUBLE, p: DOUBLE>>)), " +
        s"(__pa, __ps) -> named_struct('cum', __pa.cum + __ps.w, " +
        s"'out', concat(__pa.out, array(named_struct('x', __ps.x, 'p', __pa.cum + __ps.w / 2)))), " +
        s"__pa -> __pa.out)"
      val t = s"(($level) * aggregate($merged, CAST(0 AS DOUBLE), (__ta, __ts) -> __ta + __ts.w))"
      val lp = s"array_max(transform(filter($pp, __le -> __le.p <= $t), __le -> __le.p))"
      val lx = s"array_max(transform(filter($pp, __le -> __le.p <= $t), __le -> __le.x))"
      val up = s"array_min(transform(filter($pp, __ue -> __ue.p >= $t), __ue -> __ue.p))"
      val ux = s"array_min(transform(filter($pp, __ue -> __ue.p >= $t), __ue -> __ue.x))"
      s"(CASE WHEN $lp IS NULL THEN $ux WHEN $up IS NULL THEN $lx " +
        s"WHEN $up = $lp THEN $lx " +
        s"ELSE $lx + ($ux - $lx) * ($t - $lp) / ($up - $lp) END)"
    }
    q = rewriteParamCalls(q, "quantileExactWeightedInterpolated")((p, a) => interpW(p(0), a(0), a(1)))
    q = rewriteParamCalls(q, "quantileInterpolatedWeighted")((p, a) => interpW(p(0), a(0), a(1)))
    q = rewriteCalls(q, "quantileExactWeightedInterpolated")(a => interpW("0.5", a(0), a(1)))
    q = rewriteCalls(q, "quantileInterpolatedWeighted")(a => interpW("0.5", a(0), a(1)))
    q = rewriteCalls(q, "medianExactWeightedInterpolated")(a => interpW("0.5", a(0), a(1)))
    q = rewriteCalls(q, "medianInterpolatedWeighted")(a => interpW("0.5", a(0), a(1)))

    // skewSamp/kurtSamp (AggregateFunctionStatisticsSimple.h:173,195 —
    // population central moment over the SAMPLE variance power); kurtPop
    // is non-excess (m4/m2²) while Spark's kurtosis subtracts 3.
    q = rewriteCalls(q, "skewSamp") { a =>
      val x = s"CAST(${a(0)} AS DOUBLE)"
      s"(skewness($x) * power(var_pop($x) / var_samp($x), 1.5))"
    }
    q = rewriteCalls(q, "kurtSamp") { a =>
      val x = s"CAST(${a(0)} AS DOUBLE)"
      s"((kurtosis($x) + 3.0D) * power(var_pop($x) / var_samp($x), 2))"
    }
    q = rewriteCalls(q, "kurtPop")(a =>
      s"(kurtosis(CAST(${a(0)} AS DOUBLE)) + 3.0D)")

    // covarPopMatrix/covarSampMatrix/corrMatrix
    // (AggregateFunctionVarianceMatrix.cpp: full symmetric n×n
    // Array(Array(Float64)) — n² built-in covariance aggregates)
    def matrixOf(fn: String, a: Seq[String]): String = {
      val rows = a.map(i => "array(" + a.map(j =>
        s"$fn(CAST($i AS DOUBLE), CAST($j AS DOUBLE))").mkString(", ") + ")")
      s"array(${rows.mkString(", ")})"
    }
    q = rewriteCalls(q, "covarPopMatrix")(a => matrixOf("covar_pop", a))
    q = rewriteCalls(q, "covarSampMatrix")(a => matrixOf("covar_samp", a))
    q = rewriteCalls(q, "corrMatrix")(a => matrixOf("corr", a))

    // sumMap/minMap/maxMap spelling family (AggregateFunctionSumMap.h):
    // result = tuple(sorted distinct keys, per-key reduction). Accepts
    // the (keys_array, values_array) pair form or a single Map column.
    // WithOverflow keeps the input type in the reference (wrapping);
    // here values accumulate in Float64 like the promoted base form.
    def mapPairs(a: Seq[String], fk: Option[String]): String = {
      val pairs0 =
        if (a.length == 1)
          s"flatten(collect_list(transform(map_entries(${a(0)}), __me -> named_struct('k', __me.key, 'v', CAST(__me.value AS DOUBLE)))))"
        else
          s"flatten(collect_list(zip_with(${a(0)}, ${a(1)}, (__zk, __zv) -> named_struct('k', __zk, 'v', CAST(__zv AS DOUBLE)))))"
      fk.map(f => s"filter($pairs0, __fe -> array_contains($f, __fe.k))").getOrElse(pairs0)
    }
    def mapAgg(op: String, a: Seq[String], fk: Option[String]): String = {
      val pairs = mapPairs(a, fk)
      val ks = s"array_sort(array_distinct(transform($pairs, __ke -> __ke.k)))"
      val vs = op match {
        case "sum" => s"transform($ks, __kk -> aggregate(filter($pairs, __ve -> __ve.k <=> __kk), CAST(0 AS DOUBLE), (__va, __vv) -> __va + __vv.v))"
        case "min" => s"transform($ks, __kk -> array_min(transform(filter($pairs, __ve -> __ve.k <=> __kk), __vv -> __vv.v)))"
        case _ => s"transform($ks, __kk -> array_max(transform(filter($pairs, __ve -> __ve.k <=> __kk), __vv -> __vv.v)))"
      }
      s"named_struct('keys', $ks, 'values', $vs)"
    }
    q = rewriteParamCalls(q, "sumMapFilteredWithOverflow")((p, a) => mapAgg("sum", a, Some(p(0))))
    q = rewriteParamCalls(q, "sumMapFiltered")((p, a) => mapAgg("sum", a, Some(p(0))))
    for (n <- Seq("sumMapWithOverflow", "sumMappedArrays", "sumMap"))
      q = rewriteCalls(q, n)(a => mapAgg("sum", a, None))
    for (n <- Seq("minMappedArrays", "minMap"))
      q = rewriteCalls(q, n)(a => mapAgg("min", a, None))
    for (n <- Seq("maxMappedArrays", "maxMap"))
      q = rewriteCalls(q, n)(a => mapAgg("max", a, None))

    // groupArrayLast(N)(x): the last N values in arrival order
    q = rewriteParamCalls(q, "groupArrayLast") { (p, a) =>
      val arr = s"collect_list(${a(0)})"
      s"IF(size($arr) <= ${p(0)}, $arr, slice($arr, -(${p(0)}), ${p(0)}))"
    }

    // approx_top_k/approx_top_count/approx_top_sum
    // (registerAggregateFunctions.cpp aliases of topK/topKWeighted):
    // Array(Tuple(value, count, error)); exact counts here (error = 0),
    // count-desc then value-asc tie order.
    def topN(n: String, x: String): String = {
      val arr = s"collect_list(${x})"
      s"slice(transform(array_sort(transform(array_distinct($arr), " +
        s"__d -> named_struct('negc', -size(filter($arr, __te -> __te <=> __d)), 'value', __d))), " +
        s"__s -> named_struct('value', __s.value, 'count', CAST(-__s.negc AS BIGINT), 'error', CAST(0 AS BIGINT))), 1, $n)"
    }
    def topNSum(n: String, x: String, w: String): String = {
      val arr = s"collect_list(named_struct('x', ${x}, 'w', CAST($w AS DOUBLE)))"
      s"slice(transform(array_sort(transform(array_distinct(transform($arr, __p -> __p.x)), " +
        s"__d -> named_struct('negs', -aggregate(filter($arr, __te -> __te.x <=> __d), CAST(0 AS DOUBLE), (__ta2, __te2) -> __ta2 + __te2.w), 'value', __d))), " +
        s"__s -> named_struct('value', __s.value, 'count', CAST(-__s.negs AS BIGINT), 'error', CAST(0 AS BIGINT))), 1, $n)"
    }
    for (n <- Seq("approx_top_k", "approx_top_count")) {
      q = rewriteParamCalls(q, n)((p, a) => topN(p(0), a(0)))
      q = rewriteCalls(q, n)(a =>
        if (a.length > 1) topN(a(1), a(0)) else topN("10", a(0)))
    }
    q = rewriteParamCalls(q, "approx_top_sum")((p, a) => topNSum(p(0), a(0), a(1)))
    q = rewriteCalls(q, "approx_top_sum")(a => topNSum("10", a(0), a(1)))

    // topK / topKWeighted SQL spellings (AggregateFunctionTopK.cpp):
    // plain VALUE arrays, count-desc then first-seen order (ties here
    // break value-asc, matching SpaceSaving's insertion order for the
    // monotone generators the stateless tests use). The optional third
    // parameter 'counts' switches to the tuple form approx_top_k emits.
    def topVals(n: String, x: String): String =
      s"transform(${topN(n, x)}, __tv -> __tv.value)"
    // K and load_factor bounds (AggregateFunctionTopK.cpp TOP_K_MAX_SIZE
    // and load-factor checks): a bad parameter must raise at ANALYSIS —
    // 01471's must-fail runs over unbounded system.numbers, so lazily
    // erroring after the scan would never return
    def topKCheck(p: Seq[String]): Unit = {
      for (k <- p.headOption.flatMap(_.trim.toLongOption)
           if k < 1 || k > 1000000)
        throw new IllegalArgumentException(
          s"ARGUMENT_OUT_OF_BOUND: topK size $k out of [1, 1e6]")
      for (lf <- p.lift(1).flatMap(_.trim.toLongOption)
           if lf < 1 || lf > 65536)
        throw new IllegalArgumentException(
          s"ARGUMENT_OUT_OF_BOUND: topK load factor $lf out of [1, 65536]")
    }
    // groupArraySorted(N)(x): the N smallest values, ascending
    // (reference AggregateFunctionGroupArraySorted.cpp)
    q = rewriteParamCalls(q, "groupArraySorted")((p, a) => {
      // the max-size literal may already be cast-wrapped (0::UInt64 ->
      // CAST(0 AS ...)) — read the leftmost integer
      val n = "(?<![\\w.])\\d+".r.findFirstIn(p(0)).map(_.toLong)
      if (n.contains(0L))
        throw new IllegalArgumentException(
          "BAD_ARGUMENTS: groupArraySorted max size must be positive")
      s"slice(sort_array(collect_list(${a(0)})), 1, ${p(0)})"
    })
    q = rewriteCalls(q, "groupArraySorted")(a =>
      s"sort_array(collect_list(${a(0)}))")
    // sleep/sleepEachRow: scheduling no-ops here; both return 0
    q = rewriteCalls(q, "sleep")(_ => "CAST(0 AS TINYINT)")
    q = rewriteCalls(q, "sleepEachRow")(_ => "CAST(0 AS TINYINT)")
    q = rewriteParamCalls(q, "topK")((p, a) => {
      topKCheck(p)
      if (p.length >= 3 && p(2).toLowerCase.contains("counts")) topN(p(0), a(0))
      else topVals(p(0), a(0))
    })
    q = rewriteCalls(q, "topK")(a => topVals("10", a(0)))
    q = rewriteParamCalls(q, "topKWeighted")((p, a) => {
      topKCheck(p)
      if (p.length >= 3 && p(2).toLowerCase.contains("counts")) topNSum(p(0), a(0), a(1))
      else s"transform(${topNSum(p(0), a(0), a(1))}, __tv -> __tv.value)"
    })
    q = rewriteCalls(q, "topKWeighted")(a =>
      s"transform(${topNSum("10", a(0), a(1))}, __tv -> __tv.value)")

    // sparkbar(width)(x, y) / sparkBar alias (AggregateFunctionSparkbar
    // .cpp): render on the collected (x, y) pairs — the aggregation
    // itself stays a native collect_list, the bar layout runs once per
    // group in the ChSparkbar kernel
    for (sp <- Seq("sparkbar", "sparkBar"))
      q = rewriteParamCalls(q, sp)((p, a) => {
        if (p.length != 1 && p.length != 3) // width alone or width+min+max
          throw new IllegalArgumentException(
            "BAD_ARGUMENTS: sparkbar takes (width) or (width, min_x, max_x)")
        val range = if (p.length >= 3) s", ${p(1)}, ${p(2)}" else ""
        // the reference scales y with Y-typed integer arithmetic — recover
        // Y's width from the DECLARED CH type of a bare-column y (Spark's
        // IntegerType can't distinguish UInt8 from Int32)
        val yArg = a(1).trim
        // scan the ORIGINAL text too — a Values('y UInt8', ...) schema
        // string has been rewritten into CASTs by this point
        val scanText = q0 + "\n" + q
        val queried = "(?i)\\b(?:FROM|JOIN)\\s+`?([\\w.]+)`?".r
          .findAllMatchIn(scanText).map(_.group(1).stripPrefix("default.")).toSet
        val declared =
          if (yArg.matches("[A-Za-z_][A-Za-z0-9_]*"))
            queried.flatMap(t => tableColMeta.get(t)
              .flatMap(_.find(_._1 == yArg).map(_._2))).headOption
              // Values('x UInt64, y UInt8') schema strings never reach
              // tableColMeta — recover the declared type from the text
              .orElse(("(?s)\\b" + java.util.regex.Pattern.quote(yArg) +
                  "\\s+(U?Int(?:8|16|32|64))\\b").r
                .findFirstMatchIn(scanText).map(_.group(1)))
              .getOrElse("")
          else if (yArg.matches("(?i)to(U?Int(8|16|32|64))\\s*\\(.*"))
            yArg.replaceAll("(?i)^to", "").takeWhile(_ != '(')
          else ""
        val yBound = declared.replaceAll("\\(.*", "").trim match {
          case "UInt8" => "255" case "Int8" => "127"
          case "UInt16" => "65535" case "Int16" => "32767"
          case "UInt32" => "4294967295" case "Int32" => "2147483647"
          case _ => Long.MaxValue.toString
        }
        s"ch_sparkbar(${p(0)}, $yBound, collect_list(named_struct(" +
          s"'x', ${a(0)}, 'y', ${a(1)}))$range)"
      })

    // caseWithExpression(op, v1, r1, ..., default) = CASE op WHEN v1
    // THEN r1 ... ELSE default END (reference caseWithExpression.cpp)
    q = rewriteCalls(q, "caseWithExpression") { a =>
      val rest = a.tail
      // without a default the argument count is wrong — the reference
      // requires expr + N (when, then) pairs + default (03444)
      if (rest.length % 2 == 0)
        throw new IllegalArgumentException(
          "BAD_ARGUMENTS: invalid number of arguments for function " +
            "caseWithExpression")
      val (pairs, dflt) =
        if (rest.length % 2 == 1) (rest.dropRight(1), Some(rest.last))
        else (rest, None)
      s"(CASE (${a.head}) " +
        pairs.grouped(2).map(p => s"WHEN ${p(0)} THEN ${p(1)}")
          .mkString(" ") +
        dflt.map(d => s" ELSE $d").getOrElse("") + " END)"
    }
    // getSetting / getSettingOrDefault / getMacro: rewrite-time constants
    // from the session's recorded SET statements and the test config's
    // macros block (reference getSetting.cpp / getMacro.cpp;
    // tests/config/config.d/macros.xml values)
    q = rewriteCalls(q, "getSetting") { a =>
      val nm = a(0).trim
      if (!nm.matches("'[^']*'"))
        throw new IllegalArgumentException(
          "ILLEGAL_TYPE_OF_ARGUMENT: getSetting name must be a string literal")
      val key = nm.stripPrefix("'").stripSuffix("'").toLowerCase
      recordedSettings.get(key)
        .orElse(defaultSettingValues.get(key))
        .getOrElse(throw new IllegalArgumentException(
          s"UNKNOWN_SETTING: there is no setting '$key'"))
    }
    q = rewriteCalls(q, "getSettingOrDefault") { a =>
      if (a.length != 2)
        throw new IllegalArgumentException(
          "NUMBER_OF_ARGUMENTS_DOESNT_MATCH: getSettingOrDefault takes 2 arguments")
      val nm = a(0).trim
      if (!nm.matches("'[^']*'"))
        throw new IllegalArgumentException(
          "ILLEGAL_TYPE_OF_ARGUMENT: getSettingOrDefault name must be a string literal")
      val key = nm.stripPrefix("'").stripSuffix("'").toLowerCase
      recordedSettings.get(key).orElse(defaultSettingValues.get(key))
        .getOrElse(s"(${a(1)})")
    }
    // test_function (clickhouse-test fixture, tests/config/
    // test_function.xml): an executable UDF `awk '{print $1 + $2}'`
    // over two UInt64 args. The ExecutableUdf operator covers the
    // machinery; the fixture's arithmetic applies inline.
    q = rewriteCalls(q, "test_function") { a =>
      if (a.length != 2)
        throw new IllegalArgumentException(
          "NUMBER_OF_ARGUMENTS_DOESNT_MATCH: test_function takes 2 arguments")
      s"CAST((${a(0)}) + (${a(1)}) AS BIGINT)"
    }
    q = rewriteCalls(q, "getMacro") { a =>
      val key = a(0).trim.stripPrefix("'").stripSuffix("'")
      testMacros.get(key).map(v => s"'$v'")
        .getOrElse(throw new IllegalArgumentException(
          s"NO_ELEMENTS_IN_CONFIG: macro '$key' is not defined"))
    }
    // singleValueOrNull (AggregateFunctionSingleValueOrNull.cpp): the
    // group's value when every row agrees, NULL as soon as two differ
    q = rewriteCalls(q, "singleValueOrNull")(a =>
      s"(CASE WHEN count(DISTINCT ${a(0)}) = 1 THEN max(${a(0)}) END)")

    // groupArrayIntersect (AggregateFunctionGroupArrayIntersect.cpp):
    // running intersection of the group's array values, sorted ascending
    q = rewriteCalls(q, "groupArrayIntersect") { a =>
      val arr = s"collect_list(${a(0)})"
      s"array_sort(array_distinct(CASE WHEN size($arr) = 1 THEN element_at($arr, 1) " +
        s"ELSE aggregate(slice($arr, 2, size($arr) - 1), element_at($arr, 1), " +
        s"(__acc, __e) -> array_intersect(__acc, __e)) END))"
    }

    // retention(c1, .., cN) (AggregateFunctionRetention.cpp): flags[i] =
    // "condition i held on SOME row"; result[0] = flags[0], result[i] =
    // flags[0] AND flags[i] — conditions may fire on different rows.
    q = rewriteCalls(q, "retention") { a =>
      def flag(c: String) = s"max(CASE WHEN ($c) THEN 1 ELSE 0 END)"
      val f0 = flag(a.head)
      val elems = f0 +: a.tail.map(c => s"least($f0, ${flag(c)})")
      elems.map(e => s"CAST($e AS TINYINT)").mkString("array(", ", ", ")")
    }

    // (groupBitmapXor now lives with the r15 bitmap-state fold templates:
    // the reference's signature takes bitmap STATES, not scalars)

    // distinctJSONPaths/distinctJSONPathsAndTypes/distinctDynamicTypes
    // (AggregateFunctionDistinctJSONPaths.cpp): sorted distinct leaf
    // paths (or path:type pairs / value types) across the group's rows
    q = rewriteCalls(q, "distinctJSONPaths")(a =>
      s"array_sort(array_distinct(flatten(collect_list(json_all_paths(${a(0)})))))")
    // AndTypes returns Map(path -> sorted distinct types), the
    // reference's result shape
    q = rewriteCalls(q, "distinctJSONPathsAndTypes") { a =>
      val pairs = s"flatten(collect_list(map_entries(json_all_paths_with_types(${a(0)}))))"
      val ks = s"array_sort(array_distinct(transform($pairs, __jp -> __jp.key)))"
      s"map_from_arrays($ks, transform($ks, __jk -> " +
        s"array_sort(array_distinct(transform(filter($pairs, __je -> __je.key = __jk), __je2 -> __je2.value)))))"
    }
    // distinctDynamicTypes classifies via JSONType (the later template
    // expands it — this batch runs before the JSON templates)
    q = rewriteCalls(q, "distinctDynamicTypes")(a =>
      s"array_sort(array_distinct(collect_list(JSONType(${a(0)}))))")

    // array_concat_agg = groupArrayArray
    q = rewriteCalls(q, "array_concat_agg")(a => s"flatten(collect_list(${a(0)}))")
    q
  }

  /** Round-10 batch 30: scalar/introspection tail (reference
    * serverConstants.cpp, filesystemHelpers.cpp, Kusto/KqlArraySort.cpp,
    * the Variant/Dynamic probe functions, initializeAggregation).
    * Server-context values are captured once at rewrite time — the same
    * constant-per-query behavior the reference's server constants have. */
  private def rewriteScalarTail(q0: String): String = {
    var q = q0
    // fromUnixTimestampInJodaSyntax(ts, fmt[, tz]): the Joda render of
    // the converted timestamp (later templates expand both CH names)
    q = rewriteCalls(q, "fromUnixTimestampInJodaSyntax")(a =>
      if (a.length == 1) s"fromUnixTimestamp(${a(0)})"
      else s"formatDateTimeInJodaSyntax(fromUnixTimestamp(${a(0)}), ${a(1)})")

    // kql_array_sort_asc/desc (KqlArraySort.cpp): zip, sort by the first
    // array (nulls last — KQL default; the optional trailing bool flag
    // is accepted), return the tuple of permuted arrays
    def kqlSort(a0: Seq[String], desc: Boolean): String = {
      val a = if (a0.length > 1 &&
          Set("true", "false")(a0.last.trim.toLowerCase)) a0.dropRight(1) else a0
      val (lt, gt) = if (desc) (">", "<") else ("<", ">")
      def cmp(l: String, r: String): String =
        s"CASE WHEN $l IS NULL AND $r IS NULL THEN 0 WHEN $l IS NULL THEN 1 " +
          s"WHEN $r IS NULL THEN -1 WHEN $l $lt $r THEN -1 WHEN $l $gt $r THEN 1 ELSE 0 END"
      if (a.length == 1)
        s"named_struct('a1', array_sort(${a(0)}, (__l, __r) -> ${cmp("__l", "__r")}))"
      else {
        val zip = s"zip_with(${a(0)}, ${a(1)}, (__zx, __zy) -> named_struct('k', __zx, 'v', __zy))"
        val sorted = s"array_sort($zip, (__l, __r) -> ${cmp("__l.k", "__r.k")})"
        s"named_struct('a1', transform($sorted, __s -> __s.k), " +
          s"'a2', transform($sorted, __s2 -> __s2.v))"
      }
    }
    q = rewriteCalls(q, "kql_array_sort_asc")(a => kqlSort(a, desc = false))
    q = rewriteCalls(q, "kql_array_sort_desc")(a => kqlSort(a, desc = true))

    // Variant/Dynamic probes over the string-encoded dynamic model
    // (reference dynamicType returns 'None' for NULL)
    def dynType(x: String): String =
      s"(CASE WHEN ($x) IS NULL THEN 'None' " +
        s"WHEN CAST($x AS STRING) IN ('true', 'false') THEN 'Bool' " +
        s"WHEN CAST($x AS STRING) RLIKE '^-?[0-9]+$$' THEN 'Int64' " +
        s"WHEN try_cast(CAST($x AS STRING) AS DOUBLE) IS NOT NULL THEN 'Float64' " +
        s"ELSE 'String' END)"
    for (n <- Seq("dynamicType", "variantType"))
      q = rewriteCalls(q, n)(a => dynType(a(0)))
    for (n <- Seq("dynamicElement", "variantElement"))
      q = rewriteCalls(q, n)(a =>
        s"IF(${dynType(a(0))} = ${a(1)}, CAST(${a(0)} AS STRING), CAST(NULL AS STRING))")

    // server constants (serverConstants.cpp; revision =
    // cmake/autogenerated_versions.txt VERSION_REVISION)
    q = rewriteCalls(q, "revision")(_ => "CAST(54499 AS INT)")
    q = rewriteCalls(q, "buildId")(_ => s"'$buildIdHex'")
    q = rewriteCalls(q, "getOSKernelVersion")(_ =>
      s"'${System.getProperty("os.name")} ${System.getProperty("os.version")}'")
    q = rewriteCalls(q, "filesystemAvailable")(_ =>
      s"CAST(${fileStore.getUsableSpace}L AS BIGINT)")
    q = rewriteCalls(q, "filesystemCapacity")(_ =>
      s"CAST(${fileStore.getTotalSpace}L AS BIGINT)")
    q = rewriteCalls(q, "filesystemUnreserved")(_ =>
      s"CAST(${fileStore.getUnallocatedSpace}L AS BIGINT)")
    for (n <- Seq("currentProfiles", "enabledProfiles", "defaultProfiles"))
      q = rewriteCalls(q, n)(_ => "array('default')")
    for (n <- Seq("current_schemas", "currentSchemas"))
      q = rewriteCalls(q, n)(_ => "array('default')")
    for (n <- Seq("current_query_id", "currentQueryID"))
      q = rewriteCalls(q, n)(_ => s"'${java.util.UUID.randomUUID()}'")

    // batch 35: JSON dynamic-path introspection — every path is dynamic
    // in this model (no shared-data demotion; the reference's
    // max_dynamic_paths storage knob has no analog here)
    q = rewriteCalls(q, "JSONDynamicPathsWithTypes")(a =>
      s"json_all_paths_with_types(${a(0)})")
    q = rewriteCalls(q, "JSONDynamicPaths")(a => s"json_all_paths(${a(0)})")
    q = rewriteCalls(q, "JSONSharedDataPathsWithTypes")(_ =>
      "map_from_arrays(CAST(array() AS ARRAY<STRING>), CAST(array() AS ARRAY<STRING>))")
    q = rewriteCalls(q, "JSONSharedDataPaths")(_ => "CAST(array() AS ARRAY<STRING>)")
    q = rewriteCalls(q, "isDynamicElementInSharedData")(_ => "false")
    // globalVariable: the reference's hardcoded MySQL-compat defaults
    // (globalVariable.cpp:79-87; unknown variables -> Int32 0)
    q = rewriteCalls(q, "globalVariable") { a =>
      stripName(a(0)).toLowerCase match {
        case "max_allowed_packet" => "CAST(67108864 AS INT)"
        case "version" => "'5.7.30'"
        case "version_comment" | "session_track_system_variables" => "''"
        case "transaction_isolation" => "'READ-UNCOMMITTED'"
        case "sql_mode" => "'ALLOW_INVALID_DATES,ANSI_QUOTES,IGNORE_SPACE," +
          "NO_AUTO_VALUE_ON_ZERO,NO_DIR_IN_CREATE,ONLY_FULL_GROUP_BY," +
          "PAD_CHAR_TO_FULL_LENGTH,PIPES_AS_CONCAT,REAL_AS_FLOAT'"
        case _ => "CAST(0 AS INT)"
      }
    }

    q = rewriteCalls(q, "lowCardinalityKeys")(a => s"(${a(0)})")
    // aggThrow(p)(x...): throws with probability p per group finalize
    // (AggregateFunctionAggThrow.cpp); p=0 -> count-like no-op
    q = rewriteParamCalls(q, "aggThrow")((p, _) =>
      s"IF(rand() < (${p(0)}), CAST(raise_error('aggThrow') AS BIGINT), count(*))")

    // batch 32: region functions (the optional geobase-selector / lang
    // argument of the reference is accepted and dropped — one geobase)
    for (kind <- Seq("City", "Area", "District", "Country", "Continent",
        "TopContinent", "Population"))
      q = rewriteCalls(q, s"regionTo$kind")(a =>
        s"region_to_${kind.toLowerCase}(${a(0)})")
    q = rewriteCalls(q, "regionToName")(a => s"region_to_name(${a(0)})")
    q = rewriteCalls(q, "regionIn")(a => s"region_in(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "regionHierarchy")(a => s"region_hierarchy(${a(0)})")

    // batch 33: stochastic{Linear,Logistic}Regression →
    // order-independent sufficient-statistics solve (MlMethods.scala);
    // the SGD hyperparameters (learning rate, l2, batch size, method)
    // select convergence behavior in the reference and are accepted and
    // dropped here — the state is the converged solution itself.
    def mlState(fn: String, a: Seq[String]): String =
      s"$fn(array(${a.map(x => s"CAST($x AS DOUBLE)").mkString(", ")}))"
    for ((n, fn) <- Seq(
        "stochasticLinearRegressionState" -> "ml_linreg_state",
        "stochasticLinearRegression" -> "ml_linreg_state",
        "stochasticLogisticRegressionState" -> "ml_logreg_state",
        "stochasticLogisticRegression" -> "ml_logreg_state")) {
      q = rewriteParamCalls(q, n)((_, a) => mlState(fn, a))
      q = rewriteCalls(q, n)(a => mlState(fn, a))
    }
    // evalMLMethod(state, x1..xk): w·[x,1], sigmoid for logistic states
    q = rewriteCalls(q, "evalMLMethod") { a =>
      val feats = a.tail
      val z = feats.zipWithIndex.map { case (x, i) =>
        s"try_element_at(__m, ${i + 2}) * CAST($x AS DOUBLE)"
      }.mkString(" + ") + s" + try_element_at(__m, ${feats.length + 2})"
      s"element_at(transform(array(${a(0)}), __m -> " +
        s"IF(try_element_at(__m, 1) = CAST(1 AS DOUBLE), " +
        s"CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-($z))), $z)), 1)"
    }

    // batch 33: sequenceMatchEvents for the canonical '(?1).*(?2)'
    // pattern (AggregateFunctionSequenceMatch.cpp:719 — the timestamps
    // on the first successful match path: the earliest cond1 event and
    // the earliest cond2 event after it). sequenceMatch/sequenceCount
    // for general patterns live as DataFrame plans (queries/Aggregates).
    q = rewriteParamCalls(q, "sequenceMatchEvents") { (p, a) =>
      val pat = stripName(p(0))
      require(pat == "(?1).*(?2)",
        s"sequenceMatchEvents: only the '(?1).*(?2)' pattern is SQL-routed, got '$pat'")
      val arr = s"array_sort(collect_list(named_struct('ts', CAST(${a(0)} AS BIGINT), 'c1', ${a(1)}, 'c2', ${a(2)})))"
      s"element_at(transform(array(array_min(transform(filter($arr, __s -> __s.c1), __s -> __s.ts))), __t1 -> " +
        s"element_at(transform(array(array_min(transform(filter($arr, __s2 -> __s2.c2 AND __s2.ts > __t1), __s2 -> __s2.ts))), __t2 -> " +
        s"IF(__t1 IS NOT NULL AND __t2 IS NOT NULL, array(__t1, __t2), array())), 1)), 1)"
    }

    // sequenceMatch('(?1)(?t<T)(?2)…')(ts, c1, …): linear chains of
    // condition steps with optional adjacent time constraints
    // (AggregateFunctionSequenceMatch.cpp pattern grammar, restricted to
    // the no-`.*` form used across sequence_match.xml). Semantics: events
    // matching NO condition are dropped; the remaining sequence must
    // contain the chain at CONSECUTIVE positions, each (?t OP n) checked
    // between the two adjacent matched events.
    q = rewriteParamCalls(q, "sequenceMatch") { (p, a) =>
      val pat = stripName(p(0))
      val tokRe = "\\(\\?(?:(\\d+)|t\\s*([<>]=?|==?)\\s*(\\d+))\\)".r
      val toks = tokRe.findAllMatchIn(pat).toSeq
      require(toks.map(_.matched).mkString == pat.replaceAll("\\s+", ""),
        s"sequenceMatch: only linear '(?N)[(?t OP n)]' chains are SQL-routed, got '$pat'")
      // fold into steps: (condIdx, constraint-vs-previous)
      val steps = scala.collection.mutable.ArrayBuffer.empty[(Int, Option[(String, Long)])]
      var pendingT: Option[(String, Long)] = None
      for (t <- toks) {
        if (t.group(1) != null) { steps += ((t.group(1).toInt, pendingT)); pendingT = None }
        else {
          require(steps.nonEmpty, s"sequenceMatch: pattern starts with a time constraint: '$pat'")
          pendingT = Some((if (t.group(2) == "==") "=" else t.group(2), t.group(3).toLong))
        }
      }
      require(pendingT.isEmpty && steps.nonEmpty,
        s"sequenceMatch: dangling time constraint in '$pat'")
      val conds = a.tail.map(c => s"coalesce(CAST(($c) AS BOOLEAN), false)")
      require(steps.forall(s => s._1 >= 1 && s._1 <= conds.length),
        s"sequenceMatch: pattern references condition out of range in '$pat'")
      val evs = s"filter(array_sort(collect_list(named_struct(" +
        s"'ts', CAST((${a(0)}) AS DOUBLE), 'm', array(${conds.mkString(", ")})))), " +
        s"__e -> exists(__e.m, __x -> __x))"
      val s = steps.length
      val body = steps.zipWithIndex.map { case ((ci, tc), j) =>
        val step = s"element_at(element_at(__sq, __i + $j).m, $ci)"
        tc match {
          case Some((op, n)) =>
            s"$step AND (element_at(__sq, __i + $j).ts - " +
              s"element_at(__sq, __i + ${j - 1}).ts) $op $n"
          case None => step
        }
      }.mkString(" AND ")
      s"element_at(transform(array($evs), __sq -> " +
        s"CASE WHEN size(__sq) >= $s THEN " +
        s"exists(sequence(1, size(__sq) - ${s - 1}), __i -> $body) " +
        s"ELSE false END), 1)"
    }

    // initializeAggregation('fState', x): materialize a single-value
    // aggregate state. Algebraic aggregates' -State here IS the value
    // (sum/min/max/any); uniqThetaState gets a real one-hash KMV state
    // that merges with aggregated states (Batch30.ThetaSingletonState).
    q = rewriteCalls(q, "initializeAggregation") { a =>
      stripName(a(0)) match {
        case "sumState" | "minState" | "maxState" | "anyState" |
             "anyLastState" => s"(${a(1)})"
        case "countState" => "CAST(1 AS BIGINT)"
        case "groupArrayState" | "groupUniqArrayState" => s"array(${a(1)})"
        // a single-row avg state is (sum=x, count=1) — the same
        // (s, c) pair avgState/avgMerge use (avg_serialization.xml)
        case "avgState" =>
          s"named_struct('s', CAST(${a(1)} AS DOUBLE), 'c', CAST(1 AS BIGINT))"
        // argMax/argMin singleton state: the value IS the state
        // (matches the max_by/min_by -State routing)
        case "argMaxState" | "argMinState" => s"(${a(1)})"
        case "uniqThetaState" | "uniqState" | "uniqExactState" =>
          s"uniq_theta_singleton(${a(1)})"
        case other => throw new IllegalArgumentException(
          s"initializeAggregation: unsupported state function '$other'")
      }
    }
    q
  }

  /** Round-10 batch 31: the PromQL-style grid aggregate family
    * (reference src/AggregateFunctions/AggregateFunctionTimeseries*.h —
    * timeSeriesRateToGrid / DeltaToGrid use Prometheus' extrapolated
    * rate, per the reference's own Apache-2.0 attribution at
    * AggregateFunctionTimeseriesExtrapolatedValue.h:147; Instant* are
    * irate/idelta over the last two samples; ResampleToGridWithStaleness
    * is last-value carry). Each is a single-expression scan over the
    * group's collected (ts, value) samples, exact per the reference's
    * bucket-fill loops; grid parameters must be integer literals
    * (seconds). The scale path for huge series is the ASOF-join grid
    * formulation (queries/TimeSeries.q_ts_regrid). */
  private def rewriteTimeSeriesGrid(q0: String): String = {
    var q = q0
    if (!q.contains("timeSeries")) return q
    def gridParams(p: Seq[String]): (Long, Long, Long) = {
      def plit(s: String, what: String): Long = {
        val t = s.trim
        if (t.matches("-?\\d+")) t.toLong
        else throw new IllegalArgumentException(
          s"timeSeries* grid $what must be an integer literal, got '$t'")
      }
      val start = plit(p(0), "start"); val end = plit(p(1), "end")
      val step = plit(p(2), "step")
      require(step > 0 && end >= start, "timeSeries*: bad grid parameters")
      // the reference aligns the end down by step (Base.h:69)
      (start, start + (end - start) / step * step, step)
    }
    def sortedSamples(ts: String, v: String): String =
      s"array_sort(collect_list(named_struct('ts', CAST($ts AS BIGINT), 'v', CAST($v AS DOUBLE))))"
    def grid(s0: Long, e0: Long, st: Long, perPoint: String): String =
      s"transform(sequence(CAST($s0 AS BIGINT), CAST($e0 AS BIGINT), CAST($st AS BIGINT)), __gt -> $perPoint)"

    // extrapolated delta/rate: window = [gt - w, gt]; needs >= 2 samples
    // and a nonzero sampled interval; rate adds counter-reset accumulation
    // and the zero-crossing clamp, then divides by the window length
    def extrapolated(p: Seq[String], a: Seq[String], isRate: Boolean): String = {
      val (s0, e0, st) = gridParams(p)
      val w = p(3).trim.toLong
      val arr = sortedSamples(a(0), a(1))
      val win = s"filter($arr, __s -> __s.ts <= __gt AND __s.ts >= __gt - $w)"
      val resets =
        if (isRate)
          s"aggregate(__w, named_struct('pv', CAST(NULL AS DOUBLE), 'acc', CAST(0 AS DOUBLE)), " +
            s"(__ra, __rv) -> named_struct('pv', __rv.v, 'acc', __ra.acc + " +
            s"IF(__ra.pv IS NOT NULL AND __rv.v < __ra.pv, __ra.pv, CAST(0 AS DOUBLE))), __ra -> __ra.acc)"
        else "CAST(0 AS DOUBLE)"
      val stats = s"named_struct('n', size(__w), " +
        s"'ft', try_element_at(__w, 1).ts, 'lt', try_element_at(__w, -1).ts, " +
        s"'fv', try_element_at(__w, 1).v, 'lv', try_element_at(__w, -1).v, 'rs', $resets)"
      val derived = s"named_struct('si', CAST(__x.lt - __x.ft AS DOUBLE), " +
        s"'vd', __x.lv - __x.fv + __x.rs, " +
        s"'adbs', CAST(__x.lt - __x.ft AS DOUBLE) / (size(__w) - 1), " +
        s"'dts', CAST(__x.ft - (__gt - $w) AS DOUBLE), " +
        s"'dte', CAST(__gt - __x.lt AS DOUBLE), 'fv', __x.fv)"
      val dts1 = s"IF(__y.dts >= 1.1D * __y.adbs, __y.adbs / 2, __y.dts)"
      val dts2 =
        if (isRate)
          s"IF(__y.vd > 0 AND __y.fv >= 0, LEAST(__y.si * (__y.fv / __y.vd), $dts1), $dts1)"
        else dts1
      val dte1 = s"IF(__y.dte >= 1.1D * __y.adbs, __y.adbs / 2, __y.dte)"
      val factor =
        if (isRate) s"((__y.si + $dts2 + $dte1) / __y.si / $w)"
        else s"((__y.si + $dts2 + $dte1) / __y.si)"
      val perPoint =
        s"try_element_at(transform(array($win), __w -> " +
          s"CASE WHEN size(__w) < 2 THEN CAST(NULL AS DOUBLE) " +
          s"WHEN try_element_at(__w, -1).ts = try_element_at(__w, 1).ts THEN CAST(NULL AS DOUBLE) " +
          s"ELSE try_element_at(transform(array($stats), __x -> " +
            s"try_element_at(transform(array($derived), __y -> __y.vd * $factor), 1)), 1) END), 1)"
      grid(s0, e0, st, perPoint)
    }
    q = rewriteParamCalls(q, "timeSeriesRateToGrid")((p, a) => extrapolated(p, a, isRate = true))
    q = rewriteParamCalls(q, "timeSeriesDeltaToGrid")((p, a) => extrapolated(p, a, isRate = false))

    // instant rate/delta: the last two samples at each grid point, with
    // the OLDER one still inside the window; irate clamps counter resets
    def instant(p: Seq[String], a: Seq[String], isRate: Boolean): String = {
      val (s0, e0, st) = gridParams(p)
      val w = p(3).trim.toLong
      val arr = sortedSamples(a(0), a(1))
      val win = s"filter($arr, __s -> __s.ts <= __gt)"
      val vd =
        if (isRate) s"IF(__l.v < __p.v, __l.v, __l.v - __p.v)"
        else s"(__l.v - __p.v)"
      val res =
        if (isRate) s"($vd / CAST(__l.ts - __p.ts AS DOUBLE))"
        else vd
      val perPoint =
        s"try_element_at(transform(array($win), __w -> " +
          s"CASE WHEN size(__w) < 2 THEN CAST(NULL AS DOUBLE) " +
          s"WHEN try_element_at(__w, -2).ts + $w < __gt THEN CAST(NULL AS DOUBLE) " +
          s"WHEN try_element_at(__w, -1).ts = try_element_at(__w, -2).ts THEN CAST(NULL AS DOUBLE) " +
          s"ELSE try_element_at(transform(array(try_element_at(__w, -1)), __l -> " +
            s"try_element_at(transform(array(try_element_at(__w, -2)), __p -> $res), 1)), 1) END), 1)"
      grid(s0, e0, st, perPoint)
    }
    q = rewriteParamCalls(q, "timeSeriesInstantRateToGrid")((p, a) => instant(p, a, isRate = true))
    q = rewriteParamCalls(q, "timeSeriesInstantDeltaToGrid")((p, a) => instant(p, a, isRate = false))

    // last-value carry with staleness (ToGridSparse.h:140-152)
    q = rewriteParamCalls(q, "timeSeriesResampleToGridWithStaleness") { (p, a) =>
      val (s0, e0, st) = gridParams(p)
      val w = p(3).trim.toLong
      val arr = sortedSamples(a(0), a(1))
      val perPoint =
        s"try_element_at(transform(array(try_element_at(filter($arr, __s -> __s.ts <= __gt), -1)), " +
          s"__l -> IF(__l.ts + $w >= __gt, __l.v, CAST(NULL AS DOUBLE))), 1)"
      grid(s0, e0, st, perPoint)
    }

    // debugging aggregate: the last two (ts, value) samples, newest first
    q = rewriteCalls(q, "timeSeriesLastTwoSamples") { a =>
      val arr = sortedSamples(a(0), a(1))
      s"named_struct('timestamps', transform(slice(reverse($arr), 1, 2), __s -> __s.ts), " +
        s"'values', transform(slice(reverse($arr), 1, 2), __s2 -> __s2.v))"
    }
    q
  }

  private lazy val fileStore =
    java.nio.file.Files.getFileStore(java.nio.file.Paths.get("."))

  /** Stable per-process build id (reference buildId() returns the ELF
    * build-id hex of the binary; here: SHA-1 of the engine identity). */
  private lazy val buildIdHex: String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s"graft-spark-${org.apache.spark.SPARK_VERSION}-r54499".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** CH scalar/expression WITH aliases (reference ParserWithElement /
    * ApplyWithSubqueryVisitor — `WITH 5 AS x SELECT x + 1`,
    * `WITH n * 2 AS d SELECT d FROM t`, `WITH (SELECT max(k) FROM t) AS m
    * SELECT ...`): substitute each alias through the remainder of the
    * query, the textual analog of the reference's AST substitution.
    * Standard `name AS (SELECT …)` CTEs are left in place; mixed lists
    * keep their CTE items. */
  /** DDL validations the reference performs at CREATE time
    * (registerStorageMergeTree / CompressionCodecFactory /
    * MergeTreeIndexFactory checks): Summing engine args must be
    * identifiers, Delta-family codecs need fixed-width types and legal
    * params, bloom index params must be sane, AggregateFunction columns
    * cannot key ORDER/PARTITION/SAMPLE BY. Throws like the reference. */
  private def validateCreate(colList: String, rest: String): Unit = {
    def bad(msg: String) =
      throw new IllegalArgumentException(s"CREATE TABLE: $msg")
    "(?is)ENGINE\\s*=?\\s*SummingMergeTree\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)".r
      .findFirstMatchIn(rest).foreach { m =>
        val args = splitArgs(m.group(1)).map(_.trim).filter(_.nonEmpty)
        // deprecated positional spelling carries an integer granularity
        // (date[, sampling], key, granularity[, (summed)]): identifiers,
        // tuples of identifiers and ints are all legal there
        val legacy = args.exists(_.matches("\\d+"))
        val ok =
          if (legacy) args.forall(a => a.matches("\\w+|\\d+") ||
            (a.startsWith("(") && splitArgs(a.stripPrefix("(").stripSuffix(")"))
              .map(_.trim).forall(_.matches("`?[\\w.]+`?"))))
          else args.forall(a => a.matches("\\w+") ||
            (a.startsWith("(") && splitArgs(a.stripPrefix("(").stripSuffix(")"))
              .map(_.trim).forall(_.matches("`?\\w+`?"))))
        if (!ok)
          bad(s"SummingMergeTree arguments must be column identifiers: ${m.group(1)}")
        // an explicitly summed column must NOT belong to the sorting /
        // partition key (reference MergeTreeData BAD_ARGUMENTS, 01373)
        if (!legacy) {
          val summed = args.flatMap(a =>
            if (a.startsWith("(")) splitArgs(a.stripPrefix("(").stripSuffix(")"))
              .map(_.trim.stripPrefix("`").stripSuffix("`"))
            else Seq(a)).filter(_.nonEmpty)
          val keyCols = Seq("ORDER\\s+BY", "PARTITION\\s+BY", "PRIMARY\\s+KEY")
            .flatMap(k => s"(?is)\\b$k\\s+(\\((?:[^()]|\\([^()]*\\))*\\)|[^\\s;()]+)".r
              .findFirstMatchIn(rest).map(_.group(1)))
            .flatMap(g =>
              if (g.startsWith("(")) splitArgs(g.stripPrefix("(").stripSuffix(")"))
                .map(_.trim) else Seq(g))
            // a key may be an EXPRESSION (a % 5): every identifier in it
            // is part of the sorting/partition key for this check
            .flatMap(gg => "[A-Za-z_]\\w*".r.findAllIn(gg))
          summed.find(s0 => keyCols.exists(_.equalsIgnoreCase(s0))).foreach(s0 =>
            bad(s"SummingMergeTree column $s0 is in the sorting key"))
        }
      }
    // projection PK entries must be column identifiers — a positional /
    // constant in its ORDER BY is ILLEGAL_COLUMN (02816 anchor shape;
    // reference ProjectionsDescription::getProjectionFromAST)
    for (item <- splitArgs(colList).map(_.trim)
         if item.toLowerCase.startsWith("projection");
         om <- "(?is)\\border\\s+by\\s+\\(?([^()]+?)\\)?\\s*\\)?\\s*$".r
           .findFirstMatchIn(item))
      if (splitArgs(om.group(1)).map(_.trim).exists(_.matches("\\d+")))
        bad("projection primary key cannot contain constants")
    // Buffer(db, table, num_layers, min/max time/rows/bytes...): numeric
    // args must be non-negative and num_layers positive (reference
    // StorageBuffer::create BAD_ARGUMENTS)
    "(?is)ENGINE\\s*=?\\s*Buffer\\s*\\(([^)]*)\\)".r
      .findFirstMatchIn(rest).foreach { m =>
        val nums = splitArgs(m.group(1)).map(_.trim).drop(2)
        val vals = nums.map(s =>
          try s.toDouble catch { case _: NumberFormatException =>
            bad(s"Buffer: non-numeric argument $s") })
        if (vals.nonEmpty && vals.head <= 0)
          bad("Buffer: num_layers must be a positive integer")
        if (vals.exists(_ < 0))
          bad("Buffer: arguments must be non-negative")
      }
    // block-size settings must be positive (reference
    // MergeTreeSettings validation, 03457 anchor shape)
    ("(?i)(marks_compress_block_size|primary_key_compress_block_size|" +
      "min_compress_block_size|max_compress_block_size)\\s*=\\s*0\\b").r
      .findFirstMatchIn(rest).foreach(m => bad(s"${m.group(1)} cannot be 0"))
    def intVal(s0: String): Option[Long] = {
      val s = s0.trim
      if (s.matches("\\d+")) Some(s.toLong)
      else if (s.matches("(?i)0x[0-9a-f]+")) Some(java.lang.Long.parseLong(s.drop(2), 16))
      else None
    }
    val aggCols = scala.collection.mutable.Set[String]()
    for (item <- splitArgs(colList).map(_.trim)) {
      val head = item.takeWhile(!_.isWhitespace)
      if (head.equalsIgnoreCase("index")) {
        "(?is)\\btype\\s+(tokenbf_v1|ngrambf_v1|bloom_filter)\\s*\\(([^)]*)\\)".r
          .findFirstMatchIn(item).foreach { m =>
            val args = splitArgs(m.group(2)).map(_.trim).filter(_.nonEmpty)
            m.group(1).toLowerCase match {
              case "tokenbf_v1" =>
                if (args.length != 3) bad("tokenbf_v1 needs 3 arguments")
                val vs = args.map(a => intVal(a).getOrElse(bad(s"tokenbf_v1: non-integer argument $a")))
                if (vs(0) < 1 || vs(0) > (1L << 30)) bad("tokenbf_v1: filter size out of range")
                if (vs(1) < 1 || vs(1) > 64) bad("tokenbf_v1: hash count out of range")
              case "ngrambf_v1" =>
                if (args.length != 4) bad("ngrambf_v1 needs 4 arguments")
                val vs = args.map(a => intVal(a).getOrElse(bad(s"ngrambf_v1: non-integer argument $a")))
                if (vs(0) < 1 || vs(1) < 1 || vs(1) > (1L << 30) || vs(2) < 1 || vs(2) > 64)
                  bad("ngrambf_v1: arguments out of range")
              case _ =>
                if (args.length > 1) bad("bloom_filter takes at most one argument")
                args.headOption.foreach { a =>
                  val p = try a.toDouble catch { case _: Exception => bad(s"bloom_filter: bad rate $a") }
                  if (p <= 0 || p >= 1) bad("bloom_filter: rate must be in (0, 1)")
                }
            }
          }
      } else {
        val name = head.stripPrefix("`").stripSuffix("`")
        val tail = item.drop(head.length).trim
        if ("(?is)^AggregateFunction\\b".r.findFirstIn(tail).isDefined)
          aggCols += name
        "(?is)\\bCODEC\\s*\\((.*)\\)".r.findFirstMatchIn(item).foreach { m =>
          val narrow = // Delta family needs a fixed width of at most 8 bytes
            "(?is)^(`[^`]+`|\\w+)\\s+(U?Int(8|16|32|64)|Float(32|64)|Date(32)?|DateTime(64)?\\b[^ ]*|Bool|Decimal(32|64)?\\s*\\((\\s*\\d{1,2}\\s*,)?[^)]*\\)|Enum8|Enum16)"
              .r.findFirstMatchIn(item).isDefined &&
              !"(?is)Decimal\\s*\\(\\s*(19|[2-9]\\d)".r.findFirstIn(item).isDefined
          for (atom <- splitArgs(m.group(1)).map(_.trim)) {
            val cm = "(?s)^(\\w+)(?:\\((.*)\\))?$".r.findFirstMatchIn(atom)
            cm.foreach { c =>
              val cname = c.group(1).toLowerCase
              val params = Option(c.group(2)).map(p => splitArgs(p).map(_.trim)).getOrElse(Seq.empty)
              cname match {
                case "delta" =>
                  if (!narrow) bad("Delta codec requires a fixed-width type of at most 8 bytes")
                  if (params.nonEmpty && !params.head.matches("[1248]"))
                    bad("Delta codec parameter must be 1, 2, 4 or 8")
                case "doubledelta" | "gorilla" | "fpc" =>
                  if (!narrow) bad(s"$cname codec requires a fixed-width type of at most 8 bytes")
                  if (params.nonEmpty && cname != "fpc")
                    bad(s"$cname codec takes no parameters")
                case _ => ()
              }
            }
          }
        }
      }
    }
    if (aggCols.nonEmpty) {
      val keyRegion = "(?is)\\b(?:ORDER|PARTITION|SAMPLE)\\s+BY\\b".r
        .findFirstMatchIn(rest).map(m => rest.substring(m.start)).getOrElse("")
      for (c <- aggCols)
        if (s"(?i)\\b${java.util.regex.Pattern.quote(c)}\\b".r.findFirstIn(keyRegion).isDefined)
          bad(s"AggregateFunction column $c cannot be used in a key")
    }
  }

  /** generateRandom('schema'[, seed, max_str, max_arr]) table function
    * (reference src/TableFunctions/TableFunctionGenerateRandom.cpp):
    * tests use it only through LIMIT + FORMAT Null / count() shapes, so a
    * bounded deterministic NULL-typed row source with the declared schema
    * is behavior-equivalent for everything the stateless suite asserts. */
  private def rewriteGenerateRandom(q0: String): String = {
    if (!q0.toLowerCase.contains("generaterandom")) return q0
    val re = "(?i)\\bgenerateRandom\\s*\\(".r
    val m = re.findFirstMatchIn(q0).getOrElse(return q0)
    var i = m.end; var depth = 1; var inStr = false
    while (i < q0.length && depth > 0) {
      val c = q0.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      i += 1
    }
    if (depth != 0) return q0
    val args = splitArgs(q0.substring(m.end, i - 1)).map(_.trim)
    if (args.isEmpty || !args.head.startsWith("'")) return q0
    // reference bounds: absurd max_string/max_array lengths are rejected
    // with TOO_LARGE_* — leave the call unrewritten so it fails loudly
    if (args.drop(1).exists(a => a.matches("\\d{10,}"))) return q0
    val cols =
      try ChTypes.parseColumns(args.head.stripPrefix("'").stripSuffix("'"))
      catch { case _: Exception => return q0 }
    if (cols.isEmpty) return q0
    val sel = cols.map(c =>
      s"CAST(NULL AS ${c.dataType.sql}) AS `${c.name}`").mkString(", ")
    val sub = s"(SELECT $sel FROM system_numbers LIMIT 65536)"
    rewriteGenerateRandom(q0.substring(0, m.start) + sub + q0.substring(i))
  }

  /** `ORDER BY key [ASC|DESC] WITH FILL [FROM f] [TO t] [STEP s]
    * [LIMIT n [WITH TIES]]` (reference
    * src/Processors/Transforms/FillingTransform.cpp): grid points absent
    * from the data are inserted with DEFAULT values for the other
    * columns (0 / '' — not carry-forward), original off-grid rows are
    * kept, TO is exclusive, and LIMIT applies after filling. Single-key
    * numeric fills only; INTERPOLATE and multi-key shapes fall through
    * to the DataFrame operators (ops/Fill.scala). */
  private val withFillQueryRe =
    ("(?is)^(.*\\S)\\s+ORDER\\s+BY\\s+([\\w`]+)(\\s+(?:ASC|DESC))?\\s+WITH\\s+FILL" +
     "(?:\\s+FROM\\s+(\\S+))?(?:\\s+TO\\s+(\\S+))?(?:\\s+STEP\\s+(\\S+))?" +
     "\\s*(?:LIMIT\\s+(\\d+)(\\s+WITH\\s+TIES)?)?\\s*;?\\s*$").r

  private def tryWithFill(spark: SparkSession, dir: String, q: String): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    if ("(?i)WITH\\s+FILL".r.findFirstIn(q).isEmpty) return None
    if ("(?i)\\bINTERPOLATE\\b".r.findFirstIn(q).isDefined) return None
    val m = withFillQueryRe.findFirstMatchIn(q).getOrElse(return None)
    val key = m.group(2).stripPrefix("`").stripSuffix("`")
    val desc = m.group(3) != null && m.group(3).trim.equalsIgnoreCase("DESC")
    val df = try sql(spark, dir, m.group(1)) catch { case _: Exception => return None }
    if (!df.columns.contains(key)) return None
    val kt = df.schema(key).dataType
    val numericKey = kt match {
      case _: NumericType => true
      case _ => false
    }
    if (!numericKey) return None
    def evalD(s: String): Option[Double] =
      try Some(spark.sql(s"SELECT CAST((${rewrite(s)}) AS DOUBLE)").head.getDouble(0))
      catch { case _: Exception => None }
    val stepAbs = m.group(6) match {
      case null => 1.0
      case s => evalD(s).getOrElse(return None)
    }
    if (stepAbs <= 0) return None
    val step = if (desc) -stepAbs else stepAbs
    val Array(dMin, dMax) = df.agg(
      min(col(key)).cast("double"), max(col(key)).cast("double"))
      .head.toSeq.map(v => Option(v).map(_.asInstanceOf[Double])).toArray
    val fromOpt = Option(m.group(4)).flatMap(evalD)
    val toOpt = Option(m.group(5)).flatMap(evalD)
    val from = fromOpt.orElse(if (desc) dMax else dMin).getOrElse(return None)
    // TO is exclusive; without TO the fill runs to the data extreme
    // (inclusive — that extreme is itself a data row)
    val n: Long = toOpt match {
      case Some(t) => math.ceil((t - from) / step).toLong.max(0L)
      case None =>
        val ext = (if (desc) dMin else dMax).getOrElse(return None)
        (((ext - from) / step).toLong + 1L).max(0L)
    }
    if (n > 10000000L) return None
    val grid = spark.range(n)
      .select((lit(from) + col("id") * lit(step)).cast(kt).as(key))
    val fillRows = grid.join(df.select(col(key)), Seq(key), "left_anti")
    val defaults = df.schema.fields.filter(_.name != key).map { f =>
      (f.dataType match {
        case _: NumericType => lit(0).cast(f.dataType)
        case StringType => lit("")
        case BooleanType => lit(false)
        case _ => lit(null).cast(f.dataType)
      }).as(f.name)
    }
    val filled = df.unionByName(
      fillRows.select((col(key) +: defaults.toIndexedSeq): _*)
        .select(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))
    val ordered = filled.orderBy(if (desc) col(key).desc else col(key).asc)
    (Option(m.group(7)), Option(m.group(8))) match {
      case (Some(lim), None) => Some(ordered.limit(lim.toInt))
      case (Some(lim), Some(_)) => // LIMIT n WITH TIES: keep equal keys
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(if (desc) col(key).desc else col(key).asc)
        Some(ordered.withColumn("__rk", rank().over(w))
          .filter(col("__rk") <= lim.toInt).drop("__rk"))
      case _ => Some(ordered)
    }
  }

  /** remote/remoteSecure/cluster/clusterAllReplicas table functions
    * (reference src/TableFunctions/TableFunctionRemote.cpp,
    * src/Storages/StorageDistributed.cpp). Every address in the stateless
    * suite resolves to the server itself, so the semantics that survive
    * single-process execution are the shard MULTIPLICITY (each shard
    * re-reads the same table — remote('127.0.0.{1,2}', t) returns t's
    * rows twice) and the `_shard_num` virtual column (1-based, only
    * materialized when the query mentions it, as CH virtual columns are
    * excluded from `SELECT *`). */
  private val testClusterShards: Map[String, (Int, Int)] = Map(
    // cluster name -> (shards, replicas per shard), from the reference's
    // tests/config.d remote_servers used by the stateless suite
    "test_shard_localhost" -> (1, 1),
    "test_cluster_two_shards" -> (2, 1),
    "test_cluster_two_shards_localhost" -> (2, 1),
    "test_cluster_two_shards_internal_replication" -> (2, 1),
    "test_cluster_one_shard_two_replicas" -> (1, 2),
    "test_cluster_one_shard_three_replicas_localhost" -> (1, 3),
    "test_cluster_two_shard_three_replicas_localhost" -> (2, 3))

  /** Number of addresses in a remote() address pattern:
    * top-level commas separate addresses, each `{a,b,c}` (or `{1..3}`)
    * group multiplies the count for its address. */
  private def addressCount(addr: String): Int =
    addr.split(",(?![^{]*})").map { part =>
      "\\{([^}]*)\\}".r.findAllMatchIn(part).map { g =>
        val body = g.group(1)
        "^(\\d+)\\.\\.(\\d+)$".r.findFirstMatchIn(body) match {
          case Some(r) => (r.group(2).toInt - r.group(1).toInt).abs + 1
          case None => body.count(_ == ',') + 1
        }
      }.product
    }.sum.max(1)

  private def rewriteRemoteCluster(q0: String): String = {
    val lower = q0.toLowerCase
    if (!lower.contains("remote") && !lower.contains("cluster")) return q0
    val re = "(?i)\\b(remoteSecure|remote|clusterAllReplicas|cluster)\\s*\\(".r
    val m = re.findFirstMatchIn(q0).getOrElse(return q0)
    var i = m.end; var depth = 1; var inStr = false
    while (i < q0.length && depth > 0) {
      val c = q0.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      i += 1
    }
    if (depth != 0) return q0
    val fn = m.group(1).toLowerCase
    val args = splitArgs(q0.substring(m.end, i - 1)).map(_.trim)
    if (args.isEmpty) return q0
    def unq(s: String) = s.stripPrefix("'").stripSuffix("'")
    val shards: Int =
      if (fn.startsWith("remote")) {
        if (!args.head.startsWith("'")) return q0
        val addr = unq(args.head)
        // '|' separates replicas within a shard; an empty shard/replica
        // spec is a reference-side error — leave the call unrewritten so
        // it fails loudly (02841/03518 anchor shapes)
        if (addr.isEmpty || addr.split("[,|]", -1).exists(_.trim.isEmpty))
          return q0
        // parallel replicas over an ad-hoc replica list need a named
        // cluster (reference: CLUSTER_DOESNT_EXIST, 02947)
        if (addr.contains("|") &&
            "(?i)\\benable_parallel_replicas\\s*=\\s*[12]".r
              .findFirstIn(q0).isDefined)
          throw new IllegalArgumentException(
            "CLUSTER_DOESNT_EXIST: parallel replicas require a named cluster")
        addressCount(addr)
      } else {
        val (s, r) = testClusterShards.getOrElse(unq(args.head), (1, 1))
        if (fn == "clusterallreplicas") s * r else s
      }
    // user/password tail args are string literals that are NOT table
    // names; the table reference is args(1) (+ args(2) when a database
    // is given first)
    val target: String = args.drop(1).filterNot(_.isEmpty) match {
      case Seq() => "system.one"
      case rest =>
        def isDbWord(s: String) = {
          val v = unq(s).toLowerCase
          v == "default" | v == "system" | v == "currentdatabase()"
        }
        val (db, tbl, used) = rest match {
          case Seq(t) => ("", t, 1)
          case d +: t +: _ if isDbWord(d) && !t.toLowerCase.startsWith("view(") =>
            (unq(d).toLowerCase, t, 2)
          case t +: _ => ("", t, 1)
        }
        // trailing args may only be 'user'/'password' string literals or
        // a numeric sharding key — a bare identifier there is the
        // reference's parameter-parsing error (02841): leave unrewritten
        if (rest.drop(used).exists(x =>
            !x.startsWith("'") && !x.matches("[\\d.]+") &&
              !x.toLowerCase.matches("rand\\(\\)|\\w+\\(.*")))
          return q0
        val t = unq(tbl)
        if (tbl.toLowerCase.startsWith("view(")) tbl
        else if (db == "system" || t.toLowerCase.startsWith("system."))
          "system." + t.stripPrefix("system.")
        else if (db == "currentdatabase()" || db == "default" || db == "")
          t.stripPrefix("default.")
        else return q0
    }
    val withShardNum = "(?i)\\b_shard_num\\b".r.findFirstIn(q0).isDefined
    val sub =
      if (shards == 1 && !withShardNum) {
        if (target.toLowerCase.startsWith("view(") ||
            target.contains('.') || target.matches("\\w+")) target
        else s"(SELECT * FROM $target)"
      } else
        (1 to shards).map { k =>
          val shardCol = if (withShardNum) s", CAST($k AS INT) AS _shard_num" else ""
          s"SELECT *$shardCol FROM $target"
        }.mkString("(", " UNION ALL ", ")")
    rewriteRemoteCluster(q0.substring(0, m.start) + sub + q0.substring(i))
  }

  /** Positional make_interval(...) argument list for one (unit, n) pair. */
  private def unitInterval(unit: String, n: String): String = {
    val zeros = Seq("0", "0", "0", "0", "0", "0", "0")
    val idx = Map("year" -> 0, "month" -> 1, "week" -> 2, "day" -> 3,
      "hour" -> 4, "minute" -> 5, "second" -> 6)
    unit.toLowerCase match {
      case "quarter" => zeros.updated(1, s"3 * ($n)").mkString(", ")
      case u => zeros.updated(idx(u), s"($n)").mkString(", ")
    }
  }

  private def rewriteScalarWith(q0: String): String = {
    if (!"(?is)^\\s*WITH\\b".r.findFirstIn(q0).isDefined) return q0
    val start = "(?is)^\\s*WITH\\b".r.findFirstMatchIn(q0).get.end
    // find the SELECT that terminates the WITH list (depth 0, word start)
    var i = start; var depth = 0; var inStr = false; var selAt = -1
    while (i < q0.length && selAt < 0) {
      val c = q0.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == 'S' || c == 's') &&
        q0.regionMatches(true, i, "SELECT", 0, 6) &&
        !Character.isLetterOrDigit(q0.charAt(i - 1)) && q0.charAt(i - 1) != '_')
        selAt = i
      i += 1
    }
    if (selAt < 0) return q0
    val items = splitArgs(q0.substring(start, selAt))
    val cteRe = "(?is)^[A-Za-z_]\\w*\\s+AS\\s*\\(\\s*SELECT.*".r
    val scalarRe = "(?is)^(.*\\S)\\s+AS\\s+([A-Za-z_]\\w*)$".r
    val keep = scala.collection.mutable.ArrayBuffer[String]()
    val subs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    items.map(_.trim).filter(_.nonEmpty).foreach {
      case it if cteRe.pattern.matcher(it).matches => keep += it
      case scalarRe(expr0, alias) =>
        // earlier aliases may appear inside later expressions
        val expr = subs.foldLeft(expr0) { case (e, (a, x)) => substIdent(e, a, x) }
        subs += ((alias, s"($expr)"))
      case it => keep += it // unrecognized item: leave for the CTE path
    }
    if (subs.isEmpty) return q0
    val rest0 = q0.substring(selAt)
    val rest = subs.foldLeft(rest0) { case (r, (a, x)) => substIdent(r, a, x) }
    if (keep.isEmpty) rest else s"WITH ${keep.mkString(", ")} $rest"
  }

  /** Whole-identifier substitution that skips qualified references (t.x)
    * and occurrences inside single-quoted string literals. */
  private def substIdent(text: String, ident: String, repl: String): String = {
    val re = s"\\b${java.util.regex.Pattern.quote(ident)}\\b".r
    val sb = new StringBuilder; var last = 0
    for (m <- re.findAllMatchIn(text)) {
      val inStr = text.substring(0, m.start).count(_ == '\'') % 2 == 1
      val qualified = m.start > 0 && text.charAt(m.start - 1) == '.'
      // an alias-definition site ("AS x") must keep its name
      val isAliasDef = text.substring(0, m.start)
        .matches("(?is).*\\bAS\\s*$")
      sb.append(text.substring(last, m.start))
      sb.append(if (inStr || qualified || isAliasDef) m.matched else repl)
      last = m.end
    }
    sb.append(text.substring(last)); sb.toString
  }

  /** SQL-level ASOF JOIN spelling (reference ParserJoin ASOF strictness;
    * the API-level scale path is Ops.asofJoin). Rewritten to a correlated
    * LATERAL top-1 subquery: the equality conjuncts filter, the single
    * inequality picks the scan direction (right side at-or-before ->
    * latest DESC; at-or-after -> earliest ASC). The right table must be a
    * plain named table and the inequality must qualify its column. */
  private def rewriteAsofJoin(q0: String): String = {
    // the right side is a named table OR a parenthesized subquery
    val re = ("(?is)\\bASOF\\s+(LEFT\\s+|INNER\\s+)?JOIN\\s+" +
      "(\\w+|\\()").r
    val m = re.findFirstMatchIn(q0).getOrElse(return q0)
    val left = Option(m.group(1)).exists(_.trim.equalsIgnoreCase("LEFT"))
    // resolve the right relation text and the position after it
    val (table, afterRel) =
      if (m.group(2) == "(") {
        var j = m.end; var d = 1; var inS = false
        while (j < q0.length && d > 0) {
          val c = q0.charAt(j)
          if (inS) { if (c == '\'') inS = false }
          else if (c == '\'') inS = true
          else if (c == '(') d += 1
          else if (c == ')') d -= 1
          j += 1
        }
        if (d != 0) return q0
        (q0.substring(m.end - 1, j), j)
      } else (m.group(2), m.end)
    val tailRe = "(?is)^\\s*(?:AS\\s+)?([A-Za-z_]\\w*)?\\s*\\bON\\s+".r
    val tm = tailRe.findFirstMatchIn(q0.substring(afterRel))
      .getOrElse(return q0)
    val alias = Option(tm.group(1)).filterNot(a =>
      a.equalsIgnoreCase("ON")).getOrElse(
        if (m.group(2) == "(") return q0 else table)
    val condStart = afterRel + tm.end
    // condition runs to the next clause keyword at paren depth 0
    var i = condStart; var depth = 0; var inStr = false; var end = q0.length
    val stops = Seq("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "UNION",
      "SETTINGS", "QUALIFY")
    while (i < q0.length && end == q0.length) {
      val c = q0.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && Character.isLetter(c) &&
        !Character.isLetterOrDigit(q0.charAt(i - 1)) && q0.charAt(i - 1) != '_' &&
        stops.exists(k => q0.regionMatches(true, i, k, 0, k.length)))
        end = i
      i += 1
    }
    // strip redundant enclosing parens: `ON (a = b) AND (c < d)` and
    // `ON (a = b AND c < d)` both appear in the corpus (asof.xml)
    def stripOuter(s0: String): String = {
      var s = s0.trim; var changed = true
      while (changed && s.length >= 2 && s.head == '(' && s.last == ')') {
        var d = 0; var ok = true; var inS = false; var j = 0
        while (j < s.length - 1) {
          val c = s.charAt(j)
          if (inS) { if (c == '\'') inS = false }
          else if (c == '\'') inS = true
          else if (c == '(') d += 1
          else if (c == ')') { d -= 1; if (d == 0) ok = false }
          j += 1
        }
        if (ok && d == 1) s = s.substring(1, s.length - 1).trim
        else changed = false
      }
      s
    }
    def splitTopAnd(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var d = 0; var inS = false; var last = 0; var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        if (inS) { if (c == '\'') inS = false }
        else if (c == '\'') inS = true
        else if (c == '(') d += 1
        else if (c == ')') d -= 1
        else if (d == 0 && (c == 'A' || c == 'a') &&
            s.regionMatches(true, j, "AND", 0, 3) &&
            (j == 0 || (!Character.isLetterOrDigit(s.charAt(j - 1)) &&
              s.charAt(j - 1) != '_')) &&
            (j + 3 >= s.length || (!Character.isLetterOrDigit(s.charAt(j + 3)) &&
              s.charAt(j + 3) != '_'))) {
          out += s.substring(last, j); last = j + 3; j += 2
        }
        j += 1
      }
      out += s.substring(last)
      out.map(stripOuter).filter(_.nonEmpty).toSeq
    }
    val cond = stripOuter(q0.substring(condStart, end))
    val conjuncts = splitTopAnd(cond)
    val ineqRe = "(?s)^(.*?)(<=|>=|<|>)(.*)$".r
    val (ineqs, eqs) = conjuncts.partition(c => ineqRe.pattern.matcher(c).matches)
    // the reference requires at least one equi-conjunct besides the
    // inequality (CH: "ASOF join needs at least one equi-condition")
    if (ineqs.length != 1 || eqs.isEmpty) return q0
    val ineqRe(lhs0, op, rhs0) = ineqs.head
    val (lhs, rhs) = (lhs0.trim, rhs0.trim)
    val refsRight = (e: String) => s"(?i)\\b$alias\\.".r.findFirstIn(e).isDefined
    val (rightExpr, desc) =
      if (refsRight(rhs) && !refsRight(lhs))
        // cond: left OP right — right at-or-before when OP is >=/>
        (rhs, op == ">=" || op == ">")
      else if (refsRight(lhs) && !refsRight(rhs))
        // cond: right OP left — right at-or-before when OP is <=/<
        (lhs, op == "<=" || op == "<")
      else return q0
    val dir = if (desc) "DESC" else "ASC"
    val lateral =
      s"(SELECT * FROM $table AS $alias WHERE ${eqs.mkString(" AND ")} " +
        s"AND ${ineqs.head} ORDER BY $rightExpr $dir LIMIT 1) AS $alias"
    val joined =
      if (left) s" LEFT OUTER JOIN LATERAL $lateral ON true "
      else s" JOIN LATERAL $lateral "
    q0.substring(0, m.start) + joined + q0.substring(end)
  }

  /** Names that exist only in the CH type system — `CAST(x AS UInt8)`
    * etc. must be re-spelled before Spark's parser sees them. Spark's
    * own type names (STRING, INT, DATE, TIMESTAMP, DECIMAL...) pass
    * through untouched. */
  private val chOnlyTypeHeads = Set(
    "uint8", "uint16", "uint32", "uint64", "uint128", "uint256",
    "int8", "int16", "int32", "int64", "int128", "int256",
    "float32", "float64", "bfloat16", "date32", "datetime", "datetime32",
    "datetime64", "uuid", "ipv4", "ipv6", "bool", "json", "dynamic",
    "variant", "nothing", "fixedstring", "enum8", "enum16", "enum",
    "nullable", "lowcardinality", "decimal32", "decimal64", "decimal128",
    "decimal256", "simpleaggregatefunction")

  /** CAST(x AS <CH type>): bare CH-only names route through the
    * to<Type> conversion templates (CH wrap/saturate semantics);
    * parameterized CH types become a direct Spark CAST via ChTypes. */
  private def chAsCast(arg: String): Option[String] = {
    // last top-level ` AS ` outside strings/parens
    var i = 0; var depth = 0; var inStr = false; var asIdx = -1
    while (i + 4 <= arg.length) {
      val c = arg.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case 'A' | 'a' if depth == 0 && i > 0 &&
            arg.charAt(i - 1).isWhitespace &&
            (arg.charAt(i + 1) == 'S' || arg.charAt(i + 1) == 's') &&
            i + 2 < arg.length && arg.charAt(i + 2).isWhitespace =>
          asIdx = i
        case _ =>
      }
      i += 1
    }
    if (asIdx < 0) return Some(s"CAST($arg)")
    val l = arg.substring(0, asIdx).trim
    val tpe = arg.substring(asIdx + 2).trim
    val head = tpe.takeWhile(c => c.isLetterOrDigit || c == '_').toLowerCase
    if (tpe.matches("[A-Za-z_]\\w*") && chOnlyTypeHeads.contains(head))
      Some(s"to$tpe($l)")
    else if (tpe.contains('(') &&
        (chOnlyTypeHeads.contains(head) ||
         Set("decimal", "array", "map", "tuple").contains(head)) &&
        ChTypes.isChType(tpe))
      Some(s"CAST($l AS ${ChTypes.toSpark(tpe).sql})")
    else Some(s"CAST($arg)")
  }

  /** `ANY [LEFT|INNER] JOIN <t> [alias] USING (cols)` (reference
    * JoinSettings any_join): at most one right-side match per key — the
    * FIRST in block order. Rewritten by deduplicating the build side on
    * the USING columns before a plain join; scan order approximated with
    * monotonically_increasing_id. RIGHT/ON forms are left to the
    * DataFrame operator (ops/Ops.anyJoin). */
  private def rewriteAnyJoin(q0: String): String = {
    val re = "(?i)\\bANY\\s+(LEFT|INNER)\\s+(?:OUTER\\s+)?JOIN\\s*".r
    val m = re.findFirstMatchIn(q0).getOrElse(return q0)
    var i = m.end
    while (i < q0.length && q0.charAt(i).isWhitespace) i += 1
    if (i >= q0.length) return q0
    val tStart = i
    if (q0.charAt(i) == '(') {
      var depth = 0; var inStr = false
      while (i < q0.length && (depth > 0 || i == tStart)) {
        val c = q0.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        i += 1
      }
    } else {
      while (i < q0.length && (q0.charAt(i).isLetterOrDigit ||
        q0.charAt(i) == '_' || q0.charAt(i) == '.')) i += 1
    }
    val target = q0.substring(tStart, i)
    val usingRe =
      "(?is)^\\s*(?:AS\\s+(`?\\w+`?)\\s+|(`?\\w+`?)\\s+)??USING\\s*\\(?\\s*([\\w`]+(?:\\s*,\\s*[\\w`]+)*)\\s*\\)?".r
    val um = usingRe.findFirstMatchIn(q0.substring(i)).getOrElse {
      // `ANY … JOIN t [alias] ON l.k = r.k [AND …]`: dedupe the build
      // side on the right-qualified equality columns, keep the ON
      val onRe = "(?is)^\\s*(?:AS\\s+)?(`?\\w+`?)?\\s*\\bON\\s+".r
      val om = onRe.findFirstMatchIn(q0.substring(i)).getOrElse(return q0)
      val alias = Option(om.group(1)).map(_.stripPrefix("`").stripSuffix("`"))
        .filterNot(_.equalsIgnoreCase("ON"))
        .getOrElse(target.takeWhile(_ != '(')) // bare table name as alias
      if (alias.isEmpty) return q0
      val condStart = i + om.end
      var j = condStart; var d = 0; var inS = false; var end = q0.length
      val stops = Seq("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
        "UNION", "SETTINGS", "QUALIFY", "JOIN", "FORMAT")
      while (j < q0.length && end == q0.length) {
        val c = q0.charAt(j)
        if (inS) { if (c == '\'') inS = false }
        else if (c == '\'') inS = true
        else if (c == '(') d += 1
        else if (c == ')') d -= 1
        else if (d == 0 && Character.isLetter(c) &&
          !Character.isLetterOrDigit(q0.charAt(j - 1)) && q0.charAt(j - 1) != '_' &&
          stops.exists(k => q0.regionMatches(true, j, k, 0, k.length)))
          end = j
        j += 1
      }
      val cond = q0.substring(condStart, end)
      val eqCols = cond.split("(?i)\\bAND\\b").toSeq.map(_.trim).map { cj =>
        val c2 = cj.stripPrefix("(").stripSuffix(")").trim
        val sides = c2.split("=", 2).map(_.trim)
        if (sides.length != 2) return q0
        val rSide = sides.find(s =>
          s.matches("(?i)`?" + java.util.regex.Pattern.quote(alias) + "`?\\.[`\\w]+"))
          .getOrElse(return q0)
        rSide.substring(rSide.indexOf('.') + 1).stripPrefix("`").stripSuffix("`")
      }
      if (eqCols.isEmpty) return q0
      val colList = eqCols.distinct.mkString(", ")
      val dedup = s"(SELECT * EXCEPT (__any_rn, __any_ord) FROM (" +
        s"SELECT *, row_number() OVER (PARTITION BY $colList ORDER BY __any_ord) AS __any_rn " +
        s"FROM (SELECT *, monotonically_increasing_id() AS __any_ord FROM $target)) " +
        s"WHERE __any_rn = 1)"
      return rewriteAnyJoin(q0.substring(0, m.start) +
        s" ${m.group(1)} JOIN $dedup AS $alias ON " +
        cond + q0.substring(end))
    }
    val alias = Option(um.group(1)).orElse(Option(um.group(2)))
      .filterNot(_.equalsIgnoreCase("USING"))
    val cols = um.group(3).split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
    val colList = cols.mkString(", ")
    val dedupClean = s"(SELECT * EXCEPT (__any_rn, __any_ord) FROM (" +
      s"SELECT *, row_number() OVER (PARTITION BY $colList ORDER BY __any_ord) AS __any_rn " +
      s"FROM (SELECT *, monotonically_increasing_id() AS __any_ord FROM $target)) " +
      s"WHERE __any_rn = 1)"
    val aliasTxt = alias.map(a => s" AS $a").getOrElse("")
    val rest = q0.substring(i + um.end)
    rewriteAnyJoin(q0.substring(0, m.start) +
      s" ${m.group(1)} JOIN $dedupClean$aliasTxt USING ($colList) " + rest)
  }

  /** `primary :: Type` (ParserCastOperator) -> to<Type>(primary). The
    * primary is the adjacent token run: a quoted literal, an identifier /
    * number, or a balanced paren group (with any attached call name). */
  private def rewriteColonCast(q0: String): String = {
    var q = q0
    var idx = q.indexOf("::")
    var guard = 0
    while (idx > 0 && guard < 100) {
      guard += 1
      // never touch :: inside a string literal (IPv6 text like '::ffff:…')
      var quotes = 0; var p = 0
      while (p < idx) { if (q.charAt(p) == '\'') quotes += 1; p += 1 }
      // type name after :: (None also when inside a string)
      val tm =
        if (quotes % 2 == 1) None
        else ("^::\\s*([A-Za-z_]\\w*)" +
          "(\\s*\\([^()]*(?:\\([^()]*\\)[^()]*)*\\))?").r
          .findFirstMatchIn(q.substring(idx))
      tm match {
        case None => idx = q.indexOf("::", idx + 2)
        case Some(m) =>
          val tpe = m.group(1)
          val typeArgs = Option(m.group(2)).map(_.trim).getOrElse("")
          val afterEnd = idx + m.end
          // primary before ::
          var s = idx - 1
          while (s >= 0 && q.charAt(s).isWhitespace) s -= 1
          var start = -1
          if (s >= 0 && q.charAt(s) == '\'') {
            var j = s - 1
            while (j >= 0 && !(q.charAt(j) == '\'' && (j == 0 || q.charAt(j - 1) != '\\'))) j -= 1
            start = j
          } else if (s >= 0 && q.charAt(s) == ')') {
            var depth = 0; var j = s
            while (j >= 0 && start < 0) {
              if (q.charAt(j) == ')') depth += 1
              else if (q.charAt(j) == '(') { depth -= 1; if (depth == 0) start = j }
              j -= 1
            }
            // attached call name
            while (start > 0 && (q.charAt(start - 1).isLetterOrDigit || q.charAt(start - 1) == '_')) start -= 1
          } else if (s >= 0 && (q.charAt(s).isLetterOrDigit || q.charAt(s) == '_' || q.charAt(s) == '.')) {
            var j = s
            while (j >= 0 && (q.charAt(j).isLetterOrDigit || q.charAt(j) == '_' || q.charAt(j) == '.')) j -= 1
            start = j + 1
          }
          if (start < 0) idx = q.indexOf("::", afterEnd)
          else {
            val prim = q.substring(start, s + 1)
            // parameterized type (Decimal(p,s), DateTime64(3), ...):
            // direct CAST to the Spark type; bare names keep the
            // to<Type>() spelling the conversion templates handle
            val repl =
              if (typeArgs.isEmpty) s"to$tpe($prim)"
              // a value cannot be cast INTO an aggregate state
              // (reference CastOverloadResolver ILLEGAL_TYPE_OF_ARGUMENT)
              else if (tpe.equalsIgnoreCase("AggregateFunction"))
                throw new IllegalArgumentException(
                  s"ILLEGAL_TYPE_OF_ARGUMENT: cannot cast to $tpe$typeArgs")
              else try {
                val dt = ChTypes.toSpark(tpe + typeArgs)
                // Nullable targets: keep the nullability OBSERVABLE (the
                // cast alone types non-null when the input is) — the
                // if(true,...) wrapper folds away but types nullable, and
                // downstream Nullable-rejecting aggregates can see it
                if (tpe.equalsIgnoreCase("Nullable"))
                  s"if(true, CAST($prim AS ${dt.sql}), NULL)"
                else s"CAST($prim AS ${dt.sql})"
              } catch {
                case _: IllegalArgumentException =>
                  // reference rejects malformed parameterized types
                  // (Bool(Upyachka)) and suspicious Variant targets
                  throw new IllegalArgumentException(
                    s"ILLEGAL_TYPE_OF_ARGUMENT: cannot cast to $tpe$typeArgs")
              }
            q = q.substring(0, start) + repl + q.substring(afterEnd)
            idx = q.indexOf("::")
          }
      }
    }
    q
  }

  /** Scan `s` for the first TOP-LEVEL (depth-0, outside strings)
    * occurrence of a keyword; -1 if none. */
  private def topLevelIndexOf(s: String, kw: String): Int = {
    // group the alternation so both \b anchors apply to EVERY alternative
    // (ungrouped, "UNION|INTERSECT|EXCEPT" would match INTERSECT inside
    // identifiers like 'intersections')
    val re = ("(?i)\\b(?:" + kw + ")\\b").r
    var depth = 0; var inStr = false; var i = 0
    val hits = re.findAllMatchIn(s).map(_.start).toSet
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && hits(i)) return i
      i += 1
    }
    -1
  }

  /** `f(arrayJoin(g))` nested inside an expression: the reference lets
    * arrayJoin appear anywhere in the select list (ArrayJoinAction
    * multiplies the block); Spark allows generators only at the top
    * level. Hoist the generator into a subquery — items reference the
    * exploded alias instead — for the common single-generator shape.
    * Multiple occurrences of the SAME text share one exploded value
    * (exactly the reference's behavior); distinct generators (a
    * cartesian in the reference) are left alone. Applied recursively to
    * every parenthesized sub-SELECT. */
  private def hoistNestedArrayJoin(q0: String): String = {
    if (!"(?i)\\barrayJoin\\s*\\(".r.findFirstIn(q0).isDefined) return q0
    def balancedEnd(s: String, open: Int): Int = {
      var depth = 0; var inStr = false; var i = open
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return i }
        i += 1
      }
      -1
    }
    // blank out parenthesized sub-SELECT blocks: their arrayJoins belong
    // to THEIR select list (walk() already transformed them), not ours
    def maskSubSelects(s: String): String = {
      val sb = new StringBuilder(s); var i = 0; var inStr = false
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (inStr) { if (c == '\'') inStr = false; i += 1 }
        else if (c == '\'') { inStr = true; i += 1 }
        else if (c == '(' &&
            "(?is)^\\(\\s*SELECT\\b".r.findFirstIn(sb.substring(i)).isDefined) {
          val end = balancedEnd(sb.toString, i)
          if (end < 0) i = sb.length
          else { var j = i; while (j <= end) { sb.setCharAt(j, ' '); j += 1 }; i = end + 1 }
        } else i += 1
      }
      sb.toString
    }
    // blank the CONTENT of single-quoted literals (length-preserving) so
    // 'arrayJoin(x)' inside a string is never collected or rewritten
    def maskStrings(s: String): String = {
      val sb = new StringBuilder(s); var i = 0; var inStr = false
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (inStr) { if (c == '\'') inStr = false else sb.setCharAt(i, ' ') }
        else if (c == '\'') inStr = true
        i += 1
      }
      sb.toString
    }
    // collect arrayJoin(<balanced>) call texts appearing in `s`
    def ajCalls(s: String): Seq[String] = {
      val ms = maskStrings(s)
      "(?i)\\barrayJoin\\s*\\(".r.findAllMatchIn(ms).toSeq.flatMap { m =>
        val end = balancedEnd(s, ms.indexOf('(', m.start))
        if (end < 0) None else Some(s.substring(m.start, end + 1))
      }
    }
    def transformSelect(seg0: String): String = {
      val seg = seg0
      if (!"(?is)^\\s*SELECT\\b".r.findFirstIn(seg).isDefined) return seg
      if (ajCalls(seg).isEmpty) return seg
      // set-operation chains: transform each branch independently
      locally {
        val u = topLevelIndexOf(seg, "UNION|INTERSECT|EXCEPT")
        if (u >= 0) {
          val kw = "(?is)^(UNION(\\s+ALL|\\s+DISTINCT)?|INTERSECT|EXCEPT)\\b".r
            .findFirstIn(seg.substring(u)).getOrElse(return seg)
          return transformSelect(seg.substring(0, u)) + kw + " " +
            transformSelect(seg.substring(u + kw.length).trim)
        }
      }
      // bail on shapes whose arrayJoin placement is not plain-select-list
      for (kw <- Seq("GROUP\\s+BY", "HAVING", "ARRAY\\s+JOIN"))
        if (topLevelIndexOf(seg, kw) >= 0) return seg
      // DISTINCT applies AFTER arrayJoin in the reference — keep it on
      // the OUTER select
      val distinctM = "(?is)^\\s*SELECT\\s+(DISTINCT\\b)?".r
        .findFirstMatchIn(seg).get
      val distinct = if (distinctM.group(1) != null) "DISTINCT " else ""
      val selStart = distinctM.end
      val fromIdx = topLevelIndexOf(seg, "FROM")
      val listEnd = if (fromIdx >= 0) fromIdx else {
        val o = topLevelIndexOf(seg, "ORDER"); val l = topLevelIndexOf(seg, "LIMIT")
        val w = topLevelIndexOf(seg, "WHERE")
        Seq(o, l, w).filter(_ >= 0).sorted.headOption.getOrElse(seg.length)
      }
      val list = seg.substring(selStart, listEnd)
      val rawCalls = ajCalls(list)
      val outerCalls = ajCalls(maskSubSelects(list))
      // all in sub-selects -> nothing to do here; mixed -> too entangled
      if (outerCalls.isEmpty || rawCalls.length != outerCalls.length) return seg
      val calls = outerCalls.distinct
      if (calls.size > 1) return seg
      val aj = calls.head
      // a single occurrence that IS a whole item already works as a
      // top-level explode — leave it
      val items = splitArgs(list).map(_.trim)
      val wholeItem = "(?is)^arrayJoin\\s*\\(.*\\)\\s*(AS\\s+\\w+)?$"
      if (items.count(_.contains("arrayJoin")) == 1 &&
          items.exists(it => it.matches(wholeItem) && ajCalls(it).headOption.contains(aj)))
        return seg
      val listH = {
        // literal replacement of every occurrence of the call text,
        // skipping occurrences that START inside a quoted literal (the
        // call text itself may CONTAIN literals — e.g.
        // arrayJoin(['a','b']) — so the haystack cannot be masked)
        def inString(s: String, pos: Int): Boolean =
          s.substring(0, pos).count(_ == '\'') % 2 == 1
        def nextIdx(s: String, from: Int): Int = {
          var i = s.indexOf(aj, from)
          while (i >= 0 && inString(s, i)) i = s.indexOf(aj, i + 1)
          i
        }
        var out = list
        var idx = nextIdx(out, 0)
        while (idx >= 0) {
          out = out.substring(0, idx) + "__ajh" + out.substring(idx + aj.length)
          idx = nextIdx(out, idx)
        }
        out
      }
      if (maskStrings(listH).contains("arrayJoin")) return seg // partial-text miss: bail
      val tail = seg.substring(listEnd)
      if (fromIdx < 0) {
        // FROM-less: ORDER/LIMIT (if any) stay outside
        s"SELECT $distinct$listH FROM (SELECT $aj AS __ajh) $tail"
      } else {
        // split tail = FROM <src+where> [ORDER/LIMIT outside]
        val t2 = tail // starts with FROM...
        val ord = Seq(topLevelIndexOf(t2, "ORDER"), topLevelIndexOf(t2, "LIMIT"),
          topLevelIndexOf(t2, "SETTINGS"), topLevelIndexOf(t2, "FORMAT"))
          .filter(_ >= 0).sorted.headOption.getOrElse(t2.length)
        if (ajCalls(maskSubSelects(t2.substring(0, ord))).nonEmpty)
          return seg // arrayJoin directly in WHERE: bail
        val srcWhere = t2.substring(4, ord) // after 'FROM'
        val outer = t2.substring(ord)
        s"SELECT $distinct$listH FROM (SELECT *, $aj AS __ajh FROM $srcWhere) $outer"
      }
    }
    // innermost-first recursion over parenthesized sub-SELECTs
    def walk(s: String): String = {
      val sb = new StringBuilder; var i = 0; var inStr = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
        else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
        else if (c == '(') {
          val end = balancedEnd(s, i)
          if (end < 0) { sb.append(s.substring(i)); i = s.length }
          else {
            val inner = s.substring(i + 1, end)
            val walked = walk(inner)
            val t = if ("(?is)^\\s*SELECT\\b".r.findFirstIn(walked).isDefined)
              transformSelect(walked) else walked
            sb.append('(').append(t).append(')')
            i = end + 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    transformSelect(walk(q0))
  }

  /** Apply a regex replacement with matching done on a copy whose
    * single-quoted literal CONTENT is blanked (length-preserving), so
    * tokens inside strings are never rewritten. The replacement callback
    * receives the match (positions valid in the original text). */
  private def replaceOutsideStrings(s: String, re: scala.util.matching.Regex)(
      repl: scala.util.matching.Regex.Match => String): String = {
    val masked = {
      val sb = new StringBuilder(s); var i = 0; var inStr = false
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (inStr) { if (c == '\'') inStr = false else sb.setCharAt(i, ' ') }
        else if (c == '\'') inStr = true
        i += 1
      }
      sb.toString
    }
    val out = new StringBuilder; var last = 0
    for (m <- re.findAllMatchIn(masked)) {
      out.append(s.substring(last, m.start)).append(repl(m))
      last = m.end
    }
    out.append(s.substring(last)); out.toString
  }

  /** CH string literals support \xHH byte escapes (reference Lexer /
    * parseComplexEscapeSequence). Spark's parser doesn't — a literal
    * containing \x re-emits as CAST(unhex('<hex>') AS STRING) with ALL
    * its escapes decoded (02337 base58 of raw bytes, 00280). */
  private def rewriteHexEscapeLiterals(q: String): String = {
    if (!q.contains("\\x")) return q
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val sb = new StringBuilder
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c != '\'') { sb.append(c); i += 1 }
      else {
        val start = i
        i += 1
        val raw = new StringBuilder
        var closed = false
        while (i < q.length && !closed) {
          val ch = q.charAt(i)
          if (ch == '\\' && i + 1 < q.length) {
            raw.append(ch).append(q.charAt(i + 1)); i += 2
          } else if (ch == '\'') { closed = true; i += 1 }
          else { raw.append(ch); i += 1 }
        }
        val rawS = raw.toString
        // NOTE: append(q, start, i) would AUTO-TUPLE on scala's
        // StringBuilder (no 3-arg CharSequence overload) — substring it
        if (!closed || !rawS.contains("\\x")) sb.append(q.substring(start, i))
        else {
          val out = new java.io.ByteArrayOutputStream
          var j = 0
          while (j < rawS.length) {
            val ch = rawS.charAt(j)
            if (ch == '\\' && j + 1 < rawS.length) {
              rawS.charAt(j + 1) match {
                case 'x' if j + 3 < rawS.length &&
                    rawS.substring(j + 2, j + 4).matches("[0-9a-fA-F]{2}") =>
                  out.write(Integer.parseInt(rawS.substring(j + 2, j + 4), 16))
                  j += 4
                case 'n' => out.write('\n'); j += 2
                case 't' => out.write('\t'); j += 2
                case 'r' => out.write('\r'); j += 2
                case '0' => out.write(0); j += 2
                case o =>
                  out.write(String.valueOf(o).getBytes(utf8)); j += 2
              }
            } else {
              out.write(String.valueOf(ch).getBytes(utf8)); j += 1
            }
          }
          val hex = out.toByteArray.map(b => f"${b & 0xff}%02X").mkString
          sb.append(s"CAST(unhex('$hex') AS STRING)")
        }
      }
    }
    sb.toString
  }

  /** The format(Fmt[, 'structure'], 'data') TABLE function (reference
    * TableFunctionFormat.cpp): parses the inline data and emits a VALUES
    * relation. JSONEachRow keeps each leaf's RAW source text (array
    * values render with their original spacing, 02875); CSV/TSV parse
    * against the declared structure. Settings
    * input_format_json_read_numbers_as_strings / read_arrays_as_strings
    * widen the inferred column types like the reference. */
  private def rewriteFormatTableFn(q0: String): String = {
    if (!"(?i)\\bformat\\s*\\(".r.findFirstIn(q0).isDefined) return q0
    val fromRe = "(?i)\\b(FROM|JOIN)\\s+format\\s*\\(".r
    val m = fromRe.findFirstMatchIn(q0).getOrElse(return q0)
    val open = q0.indexOf('(', m.start + m.group(1).length)
    // find the balanced close
    var i = open; var depth = 0; var inStr = false; var close = -1
    while (i < q0.length && close < 0) {
      val c = q0.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < q0.length) i += 1
        else if (c == '\'') inStr = false
      }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) close = i }
      i += 1
    }
    if (close < 0) return q0
    val args = splitArgs(q0.substring(open + 1, close)).map(_.trim)
    if (args.length < 2 || args.length > 3) return q0
    val fmt = args.head.stripPrefix("'").stripSuffix("'")
    def unlit(s: String): Option[String] =
      if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
        Some(unescapeCh(s.substring(1, s.length - 1)))
      else if (s.startsWith("$$") && s.endsWith("$$"))
        Some(s.substring(2, s.length - 2))
      else None
    val structure =
      if (args.length == 3) unlit(args(1)).orElse(return q0) else None
    val data = unlit(args.last).getOrElse(return q0)
    val rel = try formatRelation(fmt, structure, data) catch {
      // deliberate parse rejections (bad datetime text) must surface
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(_) => return q0
    }
    rel match {
      case Some(r) =>
        rewriteFormatTableFn(
          q0.substring(0, m.start) + m.group(1) + " " + r +
            q0.substring(close + 1))
      case None => q0
    }
  }

  /** CH string-literal unescape (the lexer's escapes). */
  private def unescapeCh(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case '0' => sb.append('\u0000')
          case '\\' => sb.append('\\'); case '\'' => sb.append('\'')
          case o => sb.append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One parsed JSONEachRow line: key -> (rawText, kind) where kind is
    * 's' string (raw WITHOUT the quotes, unescaped), 'i' integer,
    * 'f' float, 'b' bool, 'n' null, 'a' array raw, 'o' object raw. */
  private def scanJsonLine(line: String): Seq[(String, (String, Char))] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, (String, Char))]
    var i = 0
    def ws(): Unit = while (i < line.length && line.charAt(i).isWhitespace) i += 1
    def str(): String = {
      // at opening quote
      val sb = new StringBuilder; i += 1
      while (i < line.length && line.charAt(i) != '"') {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < line.length) {
          line.charAt(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'u' =>
              if (i + 5 < line.length) {
                sb.append(Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar)
                i += 4
              }
            case o => sb.append(o)
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
    def value(): (String, Char) = {
      ws()
      val start = i
      line.charAt(i) match {
        case '"' => (str(), 's')
        case '[' | '{' =>
          val openCh = line.charAt(i); val closeCh = if (openCh == '[') ']' else '}'
          var d = 0; var inS = false
          while (i < line.length && (d > 0 || i == start)) {
            val c = line.charAt(i)
            if (inS) {
              if (c == '\\') i += 1 else if (c == '"') inS = false
            } else if (c == '"') inS = true
            else if (c == openCh) d += 1
            else if (c == closeCh) d -= 1
            i += 1
          }
          (line.substring(start, i), if (openCh == '[') 'a' else 'o')
        case _ =>
          while (i < line.length && !",}]".contains(line.charAt(i)) &&
            !line.charAt(i).isWhitespace) i += 1
          val tok = line.substring(start, i)
          if (tok == "null") (tok, 'n')
          else if (tok == "true" || tok == "false") (tok, 'b')
          else if (tok.matches("-?\\d+")) (tok, 'i')
          else (tok, 'f')
      }
    }
    ws()
    if (i >= line.length || line.charAt(i) != '{') return out.toSeq
    i += 1
    var done = false
    while (!done) {
      ws()
      if (i >= line.length || line.charAt(i) == '}') done = true
      else {
        if (line.charAt(i) == ',') { i += 1; ws() }
        if (i < line.length && line.charAt(i) == '"') {
          val k = str(); ws()
          if (i < line.length && line.charAt(i) == ':') i += 1
          out += (k -> value())
        } else done = true
      }
    }
    out.toSeq
  }

  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Build the inline relation text for format(...), or None when the
    * format/shape isn't supported. */
  private def formatRelation(fmt: String, structure: Option[String],
                             data: String): Option[String] = {
    val lines = data.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    val declared = structure.map(s => ChTypes.parseColumns(s))
    fmt.toLowerCase match {
      case "jsoneachrow" =>
        val rows = lines.map(scanJsonLine)
        val cols: Seq[String] = declared.map(_.map(_.name)).getOrElse {
          val seen = scala.collection.mutable.LinkedHashSet.empty[String]
          rows.foreach(_.foreach { case (k, _) => seen += k })
          seen.toSeq
        }
        if (cols.isEmpty) return None
        val numbersAsStrings = recordedSettings
          .get("input_format_json_read_numbers_as_strings").exists(_ == "1")
        // per-column kind: declared type wins; else inferred
        val arraysAsStrings0 = recordedSettings
          .get("input_format_json_read_arrays_as_strings").exists(_ == "1")
        val colType: Map[String, String] = cols.map { c =>
          val vals = rows.flatMap(_.collectFirst {
            case (k, v) if k == c => v })
          val kinds = vals.map(_._2)
          val t = declared.flatMap(_.find(_.name == c)).map(_.chType) match {
            case Some(ct) if "(?i)^(Tuple|Map|Array|Nested|Variant|JSON)".r
                .findFirstIn(ct.trim).isDefined =>
              return None // composite declared targets unsupported here
            case Some(ct) if ct.nonEmpty => chToSparkLite(ct)
            case _ =>
              val ks = kinds.filterNot(_ == 'n').distinct
              if (ks.isEmpty) "string"
              else if (ks == Seq('i')) "bigint"
              else if (ks.forall(k => k == 'i' || k == 'f')) "double"
              else if (ks.forall(k => k == 'b')) "boolean"
              else if (ks == Seq('a') && !arraysAsStrings0) {
                // typed array; element type from every row's elements
                val allInt = vals.filter(_._2 == 'a').forall { case (raw, _) =>
                  splitArgs(raw.trim.stripPrefix("[").stripSuffix("]"))
                    .map(_.trim).filter(_.nonEmpty)
                    .forall(_.matches("-?\\d+"))
                }
                if (allInt) "array<bigint>" else "array<string>"
              }
              else if (ks.forall(k => k == 's' || k == 'i' || k == 'f') &&
                numbersAsStrings) "string"
              else if (ks.forall(k => k == 's')) "string"
              else if (ks.forall(k => k == 'a' || k == 's')) "string"
              else return None
          }
          c -> t
        }.toMap
        val valueRows = rows.map { r =>
          cols.map { c =>
            r.collectFirst { case (k, v) if k == c => v } match {
              case None | Some((_, 'n')) =>
                s"CAST(NULL AS ${colType(c)})"
              case Some((raw, kd)) =>
                // an inferred (not declared, not read-as-strings) array
                // renders CH-style: Array(Int64) bare, Array(String)
                // single-quoted elements (02422)
                val arraysAsStrings = recordedSettings
                  .get("input_format_json_read_arrays_as_strings")
                  .exists(_ == "1")
                if (kd == 'a' && colType(c).startsWith("array<")) {
                  // a TYPED array (structural quotes render CH-style)
                  val elems = splitArgs(
                    raw.trim.stripPrefix("[").stripSuffix("]"))
                    .map(_.trim).filter(_.nonEmpty)
                  if (colType(c) == "array<bigint>")
                    elems.mkString("array(", ", ", ")")
                  else elems.map(e =>
                    sqlLit(if (e.startsWith("\"") && e.endsWith("\""))
                      e.substring(1, e.length - 1) else e))
                    .mkString("array(", ", ", ")")
                } else colType(c) match {
                  case "string" => sqlLit(raw)
                  case t if kd == 'b' =>
                    s"CAST(${if (raw == "true") "1" else "0"} AS $t)"
                  case t => s"CAST(${sqlLit(raw)} AS $t)"
                }
            }
          }.mkString("(", ", ", ")")
        }
        val alias = "__fmt_" + math.abs(data.hashCode).toString
        if (valueRows.isEmpty)
          Some("(SELECT " + cols.map(c =>
            s"CAST(NULL AS ${colType(c)}) AS `$c`").mkString(", ") +
            " WHERE false) AS " + alias)
        else
          Some("(VALUES " + valueRows.mkString(", ") + " AS " + alias +
            cols.map(c => s"`$c`").mkString("(", ", ", ")") + ")")
      case "csv" | "tsv" | "tabseparated" if declared.isDefined =>
        val cds = declared.get
        if (cds.exists(cd =>
            "(?i)^(Tuple|Map|Nested|Variant|JSON|AggregateFunction|SimpleAggregateFunction)".r
              .findFirstIn(cd.chType.trim).isDefined)) return None
        val sep = if (fmt.equalsIgnoreCase("csv")) ',' else '\t'
        def splitCsv(ln: String): Seq[String] = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          val cur = new StringBuilder
          var i2 = 0; var inQ = false
          while (i2 < ln.length) {
            val c = ln.charAt(i2)
            if (inQ) {
              if (c == '"') {
                if (i2 + 1 < ln.length && ln.charAt(i2 + 1) == '"') {
                  cur.append('"'); i2 += 1
                } else inQ = false
              } else cur.append(c)
            }
            else if (c == '"' && cur.isEmpty) inQ = true
            else if (c == sep) { out += cur.toString; cur.clear() }
            else cur.append(c)
            i2 += 1
          }
          out += cur.toString
          out.toSeq.map(_.trim)
        }
        val valueRows = lines.map { ln =>
          val fields = splitCsv(ln)
          cds.zipWithIndex.map { case (cd, ix) =>
            val t = chToSparkLite(cd.chType)
            val f = fields.lift(ix).getOrElse("")
            if (f == "\\N") s"CAST(NULL AS $t)"
            else if (f.isEmpty && t != "string") t match {
              // a missing field fills the TYPE DEFAULT (02834)
              case "date" => "CAST('1970-01-01' AS date)"
              case "timestamp" => "CAST('1970-01-01 00:00:00' AS timestamp)"
              case other => s"CAST(0 AS $other)"
            }
            else if (t == "string") sqlLit(f)
            // CH text parsing of dates is best-effort (yyyyMMdd,
            // comma-free variants — 02916/02812): route through the
            // dialect's own parse kernels, which later passes rewrite.
            // Trailing garbage after a parsed value is rejected
            // (UNEXPECTED_DATA_AFTER_PARSED_VALUE, 03407).
            else if (t == "date") s"toDate(${sqlLit(f)})"
            else if (t == "timestamp") {
              val ok = f.matches("\\d{4}-\\d{2}-\\d{2}([ T,]\\s?\\d{2}:\\d{2}(:\\d{2})?(\\.\\d+)?)?") ||
                f.matches("\\d+(\\.\\d+)?") || f.matches("\\d{14}")
              if (!ok) throw new IllegalArgumentException(
                s"UNEXPECTED_DATA_AFTER_PARSED_VALUE: cannot parse '$f' as DateTime")
              s"parseDateTimeBestEffort(${sqlLit(f.replace(",", ""))})"
            }
            else s"CAST(${sqlLit(f)} AS $t)"
          }.mkString("(", ", ", ")")
        }
        if (valueRows.isEmpty) None
        else Some("(VALUES " + valueRows.mkString(", ") + " AS __fmt_csv" +
          cds.map(cd => s"`${cd.name}`").mkString("(", ", ", ")") + ")")
      case _ => None
    }
  }

  /** Spark cast-target for a CH type (the simple subset format() needs). */
  private def chToSparkLite(ct: String): String = {
    val b = ct.trim.replaceAll("(?i)^Nullable\\((.*)\\)$", "$1")
    b.toLowerCase match {
      case "string" | "fixedstring" => "string"
      case t if t.startsWith("fixedstring") => "string"
      case "uint8" | "int8" | "int16" | "uint16" | "int32" => "int"
      case "uint32" | "int64" | "uint64" => "bigint"
      case "float32" => "float"
      case "float64" => "double"
      case "date" => "date"
      case t if t.startsWith("datetime") => "timestamp"
      case "bool" => "boolean"
      case _ => "string"
    }
  }

  def rewrite(chSql: String): String = {
    var q = rewriteFormatTableFn(
      rewriteHexEscapeLiterals(hoistNestedArrayJoin(chSql)))

    // getSizeOfEnumType: the declared Enum's member count — resolved
    // FIRST, while the Enum type text still exists (00511; later passes
    // rewrite CAST-to-Enum into value mappings)
    q = rewriteCalls(q, "getSizeOfEnumType") { a =>
      val enumRe = "(?is)Enum(?:8|16)?\\s*\\(((?:[^()']|'[^']*')*)\\)".r
      enumRe.findFirstMatchIn(a(0)) match {
        case Some(m) =>
          splitArgs(m.group(1)).count(_.trim.nonEmpty).toString
        case None => throw new IllegalArgumentException(
          "ILLEGAL_TYPE_OF_ARGUMENT: getSizeOfEnumType expects an Enum argument")
      }
    }

    // trailing FORMAT clause (output format is the writer's concern here);
    // also the mid-statement `FORMAT X SETTINGS …` spelling
    q = q.replaceAll("""(?is)\bFORMAT\s+\w+\s*;?\s*$""", "")
    q = q.replaceAll("""(?is)\bFORMAT\s+\w+\s+(?=SETTINGS\b)""", "")

    // CH accepts a trailing comma in IN-lists / one-element tuples:
    // `x IN (0,)` (reference ParserList); Spark rejects it. Quote-aware:
    // a string literal containing "in (1,)" must not be rewritten.
    if ("(?is)\\bin\\s*\\(".r.findFirstIn(q).nonEmpty) {
      val inCommaRe = "(?is)\\b(in\\s*\\([^()]*?),\\s*\\)".r
      val sb = new StringBuilder; var last = 0
      for (m <- inCommaRe.findAllMatchIn(q)) {
        sb.append(q.substring(last, m.start))
        val inStr = q.substring(0, m.start).count(_ == '\'') % 2 == 1
        sb.append(if (inStr) m.matched else m.group(1) + ")")
        last = m.end
      }
      sb.append(q.substring(last)); q = sb.toString
    }
    // bounded settings validate BEFORE the hint tail is absorbed
    // (reference Settings: external-memory ratios must be in [0, 1))
    for (m <- "(?i)max_bytes_ratio_before_external_(?:group_by|sort)\\s*=\\s*([0-9.eE+-]+)"
           .r.findAllMatchIn(q);
         v <- m.group(1).toDoubleOption if v < 0 || v >= 1)
      throw new IllegalArgumentException(
        s"BAD_ARGUMENTS: max_bytes_ratio_before_external settings must be in [0, 1), got $v")
    // INTERVAL (expr) UNIT — the reference's ParserIntervalOperator
    // takes an arbitrary parenthesized operand; Spark's INTERVAL only
    // takes literals, so route through make_interval (asof.xml)
    locally {
      val unitPos = Map("YEAR" -> 0, "MONTH" -> 1, "WEEK" -> 2, "DAY" -> 3,
        "HOUR" -> 4, "MINUTE" -> 5, "SECOND" -> 6)
      var from = 0
      var m = "(?i)\\bINTERVAL\\s*\\(".r.findFirstMatchIn(q.substring(from))
      var guard = 0
      while (m.isDefined && guard < 64) {
        guard += 1
        val mm = m.get
        val open = from + mm.end - 1
        var j = open + 1; var d = 1; var inS = false
        while (j < q.length && d > 0) {
          val c = q.charAt(j)
          if (inS) { if (c == '\'') inS = false }
          else if (c == '\'') inS = true
          else if (c == '(') d += 1
          else if (c == ')') d -= 1
          j += 1
        }
        val um =
          if (d == 0)
            "(?i)^\\s*(YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND)S?\\b"
              .r.findFirstMatchIn(q.substring(j))
          else None
        um match {
          case Some(u) =>
            val inner = q.substring(open + 1, j - 1)
            val unit = u.group(1).toUpperCase
            val args = Array.fill(7)("0")
            if (unit == "QUARTER") args(1) = s"CAST(3 * ($inner) AS INT)"
            else if (unit == "SECOND")
              args(6) = s"CAST(($inner) AS DECIMAL(18, 6))"
            else args(unitPos(unit)) = s"CAST(($inner) AS INT)"
            val repl = s"make_interval(${args.mkString(", ")})"
            q = q.substring(0, from + mm.start) + repl + q.substring(j + u.end)
            from = from + mm.start + repl.length
          case None => from = from + mm.end
        }
        m = "(?i)\\bINTERVAL\\s*\\(".r.findFirstMatchIn(q.substring(from))
      }
    }
    // per-query SETTINGS tail is a hint surface — absorbed (the reference
    // applies them to its own execution; Spark confs are session-level)
    // a repeated clause (`settings a=0 settings b='x'`,
    // joins_in_memory.xml) is one absorbed tail too
    q = q.replaceAll("""(?is)\bSETTINGS\s+\w+\s*=\s*\S+((\s*,\s*|\s+SETTINGS\s+)\w+\s*=\s*\S+)*\s*;?\s*$""", "")

    // quoted/spaced/commented system-table spellings — `system`.`one`,
    // system . one, system /* c */. `one` — collapse to the bare form
    // the virtual-table mapping matches (00138, 00269)
    q = q.replaceAll(
      "(?is)`?\\bsystem`?\\s*(?:/\\*.*?\\*/)?\\s*\\.\\s*`?" +
        "(one|numbers|numbers_mt|zeros|zeros_mt|tables|columns|functions)\\b`?",
      "system.$1")

    // hex / binary integer literals (reference ParserNumber accepts 0xFF
    // and 0b0101): Spark's SQL parser has neither form, so fold them to
    // decimal text before parsing. BigInt keeps UInt64-range literals
    // (0xABCDEF0123456789) intact — they parse as DECIMAL(20,0), the
    // same path bare UInt64 decimal literals take. Masked so 0x inside
    // a quoted string survives.
    q = replaceOutsideStrings(q, "(?i)(?<![\\w.])0x([0-9a-f]+)(?![\\w.])".r)(m =>
      BigInt(m.group(1), 16).toString)
    q = replaceOutsideStrings(q, "(?<![\\w.])0[bB]([01]+)(?![\\w.])".r)(m =>
      BigInt(m.group(1), 2).toString)
    // numeric literals with underscore separators (3_000_000) — the
    // reference's ParserNumber accepts them, Spark's lexer does not
    q = replaceOutsideStrings(q, "(?<![\\w.])\\d[\\d_]*_[\\d_]*\\d(?![\\w.])".r)(m =>
      m.matched.replace("_", ""))

    // negative-zero float literals: Spark parses -0. as a DECIMAL, which
    // has no signed zero — the sign is unrecoverable post-parse and
    // 1 / -0. would flip to +inf (00516). Route through a string cast.
    // Matched on a string-masked copy so '-0.0' inside a quoted literal
    // is never rewritten, and with ')' ']' '\'' excluded from the left
    // context so count(*)-0.0 / arr[1]-0.0 stay binary subtraction.
    q = replaceOutsideStrings(q, "(?<![\\w.)\\]'])-0\\.0*(?![0-9.])".r)(_ =>
      "CAST('-0.0' AS DOUBLE)")

    // CH scalar WITH aliases before anything else sees the query
    q = rewriteScalarWith(q)

    // SQL-level ASOF JOIN before FROM-clause text is touched
    q = rewriteAsofJoin(q)

    // ANY [LEFT|INNER] JOIN ... USING — dedupe the build side per key
    q = rewriteAnyJoin(q)
    // ALL JOIN is the default join semantics — drop the keyword
    q = q.replaceAll("(?i)\\bALL\\s+(LEFT|RIGHT|INNER|FULL)(\\s+OUTER)?\\s+JOIN\\b", "$1$2 JOIN")

    // toDateTime(x, 'tz'): the second argument is ALWAYS a timezone in CH
    // (never a format). CH stores an instant but RENDERS in tz; this engine
    // renders in UTC, so for byte parity we store the tz wall-clock:
    //  - string input: parse-in-tz then render-in-tz is identity → plain CAST
    //  - numeric/other input: epoch instant shifted to tz wall-clock via
    //    from_utc_timestamp. 'UTC' (and fixed UTC spellings) stay a bare cast.
    q = rewriteCalls(q, "toDateTime") { a0 =>
      // CH accepts hour 24 in literals (readDateTimeText rolls it into
      // the next day: '2016-06-15 24:00:00' = 06-16 00:00:00)
      val h24 = "^'(\\d{4}-\\d{2}-\\d{2}) 24:(\\d{2}:\\d{2}(?:\\.\\d+)?)'$".r
      val a = a0.map(x => x.trim match {
        case h24(d, rest) => s"'${java.time.LocalDate.parse(d).plusDays(1)} 00:$rest'"
        case _ => x
      })
      if (a.length == 2 && a(1).trim.matches("'[A-Za-z][\\w/+-]*'")) {
        val tz = a(1).trim
        val isUtc = tz.equalsIgnoreCase("'UTC'") || tz.equalsIgnoreCase("'Etc/UTC'") ||
          tz.equalsIgnoreCase("'GMT'") || tz.equalsIgnoreCase("'Zulu'")
        val isStrLit = a(0).trim.startsWith("'")
        if (isUtc || isStrLit) s"CAST((${a(0)}) AS TIMESTAMP)"
        else s"from_utc_timestamp(CAST((${a(0)}) AS TIMESTAMP), $tz)"
      } else s"toDateTime(${a.mkString(", ")})"
    }

    // CH tuple dot-number access: ident.1 -> tupleElement(ident, 1)
    // (float literals never match — the left side must be an identifier;
    // matches inside string literals are skipped via quote parity)
    locally {
      val re = "\\b([A-Za-z_]\\w*)\\.(\\d+)\\b".r
      val ms = re.findAllMatchIn(q).toList
      if (ms.nonEmpty) {
        val sb = new StringBuilder
        var last = 0
        for (m <- ms) {
          val inStr = q.substring(0, m.start).count(_ == '\'') % 2 == 1
          sb.append(q.substring(last, m.start))
          if (inStr) sb.append(m.matched)
          else sb.append(s"tupleElement(${m.group(1)}, ${m.group(2)})")
          last = m.end
        }
        sb.append(q.substring(last))
        q = sb.toString
      }
    }

    // bare USING k[, k2] -> USING (k, k2) (CH allows the paren-less list)
    // — matched on a literal-masked copy so 'using lightweight' inside a
    // string stays untouched (02352)
    locally {
      val masked = locally {
        val sb = new StringBuilder(q); var i = 0; var inStr = false
        while (i < sb.length) {
          val c = sb.charAt(i)
          if (inStr) { if (c == '\'') inStr = false else sb.setCharAt(i, ' ') }
          else if (c == '\'') inStr = true
          i += 1
        }
        sb.toString
      }
      val re = "(?is)\\bUSING\\s+(?!\\()([A-Za-z_]\\w*(?:\\s*,\\s*[A-Za-z_]\\w*)*)".r
      val sb = new StringBuilder(q)
      for (m <- re.findAllMatchIn(masked).toList.reverse)
        sb.replace(m.start, m.end, "USING (" + q.substring(m.start(1), m.end(1)) + ")")
      q = sb.toString
    }

    // `expr :: Type` postfix cast (reference ParserCastOperator): binds to
    // the adjacent primary; routed through the to<Type> conversion
    // templates so CH numeric semantics (UInt wrapping etc.) apply
    q = rewriteColonCast(q)

    // CH's two-argument CAST(x, 'Type') spelling (FunctionsConversion.h
    // CastOverloadResolver) — routed through accurateCast's type map;
    // the standard CAST(x AS T) single-argument form passes through
    // _CAST is the analyzer's internal spelling of the same function
    for (cname <- Seq("CAST", "cast", "_CAST", "_cast"))
      q = rewriteCalls(q, cname)(a =>
        if (a.length == 2 && a(1).trim.startsWith("'")) {
          val tpe = a(1).trim.stripPrefix("'").stripSuffix("'").trim
          // CH CAST wraps integers (toUInt8(300)=44) — the accurate
          // variant is the separate accurateCast; simple types route
          // through the to<Type> templates, parameterized ones through
          // accurateCast's type map
          if (tpe.matches("[A-Za-z]\\w*")) s"to$tpe(${a(0)})"
          // CAST((keys, values), 'Map(K,V)'): the reference builds a map
          // from the tuple's two arrays (ColumnMap shapes)
          else if (tpe.matches("(?is)Map\\s*\\(.*") && a(0).trim.startsWith("(") &&
              a(0).trim.endsWith(")") &&
              splitArgs(a(0).trim.stripPrefix("(").stripSuffix(")")).length == 2) {
            val parts = splitArgs(a(0).trim.stripPrefix("(").stripSuffix(")"))
            s"map_from_arrays(${parts(0)}, ${parts(1)})"
          }
          else if (tpe.matches("(?is)Enum(8|16)?\\s*\\(.*"))
            // a non-Nullable Enum target rejects NULL inputs at runtime
            // (reference: CANNOT_INSERT_NULL_IN_ORDINARY_COLUMN, 01536)
            s"(CASE WHEN (${a(0)}) IS NULL THEN raise_error(" +
              "'CANNOT_INSERT_NULL_IN_ORDINARY_COLUMN: cannot convert NULL " +
              s"to a non-Nullable Enum') ELSE accurateCast(${a(0)}, ${a(1)}) END)"
          else s"accurateCast(${a(0)}, ${a(1)})"
        } else if (a.length == 1) chAsCast(a(0)).getOrElse(s"CAST(${a(0)})")
        else s"CAST(${a.mkString(", ")})")

    // generic JSONExtract(json, key..., 'Type') (reference
    // src/Functions/FunctionsJSON.cpp JSONExtract): path from the middle
    // args (1-based indices / member names), value cast to the named type
    q = rewriteCalls(q, "JSONExtract")(a =>
      if (a.length >= 2 &&
          a.last.trim.matches("(?s)'[A-Za-z][\\w() ,\\s]*'")) {
        val tpe = a.last.trim.stripPrefix("'").stripSuffix("'")
          .replaceAll("\\s+", " ")
        val path = "$" + a.drop(1).dropRight(1).map(_.trim).map { k =>
          if (k.matches("-?\\d+")) s"[${k.toInt - 1}]"
          else s".${k.stripPrefix("'").stripSuffix("'")}"
        }.mkString
        val sparkT =
          try Some(ChTypes.toSpark(tpe).sql) catch { case _: Exception => None }
        sparkT match {
          case Some(t) if !t.contains("STRUCT") && !t.contains("MAP") =>
            if (t.startsWith("ARRAY"))
              s"from_json(get_json_object(${a(0)}, '$path'), '$t')"
            else s"CAST(get_json_object(${a(0)}, '$path') AS $t)"
          case Some(t) =>
            // Tuple/Map targets parse structurally (from_json handles
            // struct<>/map<> schemas; numbers coerce to String fields
            // like the reference's JSONExtract Tuple semantics)
            s"from_json(get_json_object(${a(0)}, '$path'), '${t.replace("'", "\\'")}')"
          case _ => s"JSONExtract(${a.mkString(", ")})"
        }
      } else s"JSONExtract(${a.mkString(", ")})")

    // Dynamic/Variant are type-erasing wrappers (reference
    // DataTypeDynamic/DataTypeVariant): the VALUE is unchanged, rendering
    // follows the underlying type — casts to them are identity here
    q = rewriteCalls(q, "toDynamic")(a => s"(${a(0)})")
    q = rewriteCalls(q, "toVariant")(a => s"(${a(0)})")

    // emptyArray<T>() constructors (reference src/Functions/emptyArray*.cpp)
    if (q.contains("emptyArray")) {
      val sparkT = Map(
        "UInt8" -> "INT", "UInt16" -> "INT", "UInt32" -> "BIGINT",
        "UInt64" -> "DECIMAL(20,0)", "Int8" -> "TINYINT", "Int16" -> "SMALLINT",
        "Int32" -> "INT", "Int64" -> "BIGINT", "Float32" -> "FLOAT",
        "Float64" -> "DOUBLE", "String" -> "STRING", "Date" -> "DATE",
        "DateTime" -> "TIMESTAMP")
      q = "\\bemptyArray(\\w+)\\s*\\(\\s*\\)".r.replaceAllIn(q, mm =>
        sparkT.get(mm.group(1))
          .map(t => s"CAST(ARRAY() AS ARRAY<$t>)")
          .getOrElse(mm.matched))
    }

    // CH 3-arg date_add/date_sub(unit, n, date) (reference
    // FunctionDateOrDateTimeAddInterval); Spark's 2-arg form untouched
    for ((nm, sign) <- Seq("date_add" -> "+", "date_sub" -> "-"))
      q = rewriteCalls(q, nm)(a =>
        if (a.length == 3 && a(0).trim.matches("(?i)(year|quarter|month|week|day|hour|minute|second)"))
          s"((${a(2)}) $sign make_interval(${unitInterval(a(0).trim, a(1))}))"
        else s"$nm(${a.mkString(", ")})")

    // SAMPLE k clause (reference MergeTreeDataSelectExecutor sampling):
    // fraction -> Bernoulli percent, integer -> row bound. The
    // deterministic-by-key formulation lives in Ops.sampleByKey
    // (q_sample_by_key); the SQL clause maps to Spark's native sampler.
    q = "(?i)\\bSAMPLE\\s+(\\d+(?:\\.\\d+)?)".r.replaceAllIn(q, m => {
      val v = m.group(1).toDouble
      // BUCKET form keeps the emitted literals integral (the float-literal
      // pass would D-suffix a decimal percent into invalid syntax)
      if (v > 0 && v < 1)
        s"TABLESAMPLE (BUCKET ${math.round(v * 1000000)} OUT OF 1000000)"
      else s"TABLESAMPLE (${v.toLong} ROWS)"
    })

    // table functions view(...) / numbers(...) (reference
    // src/TableFunctions/TableFunctionView.cpp, TableFunctionNumbers.cpp)
    q = rewriteCalls(q, "view")(a => s"(${a.mkString(", ")})")
    // `numbers (1, N)` — whitespace before the arg list is legal CH
    q = q.replaceAll("(?i)\\b(numbers|numbers_mt|zeros|zeros_mt)\\s+\\(", "$1(")
    for (n <- Seq("numbers", "numbers_mt"))
      q = rewriteCalls(q, n)(a =>
        if (a.length >= 2)
          // try_add: a UInt64-range offset (02016's UBSan probes) wraps
          // in the reference; here it NULLs out instead of raising
          s"(SELECT try_add(id, (${a(0)})) AS number FROM RANGE(${a(1)}))"
        else s"(SELECT id AS number FROM RANGE(${a(0)}))")
    // (RANGE uppercase: Spark resolves case-insensitively while the CH
    // array-function `range` template matches lowercase only)
    // zeros(N): N rows of a constant 0 column named `zero` — the
    // cheapest-possible generator in the reference
    // (TableFunctionZeros.cpp), ubiquitous in its performance corpus
    for (n <- Seq("zeros", "zeros_mt"))
      q = rewriteCalls(q, n)(a =>
        s"(SELECT CAST(0 AS TINYINT) AS zero FROM RANGE(${a(0)}))")
    q = q.replaceAll("""(?i)\bsystem\.numbers_mt\b""", "system_numbers")
    q = q.replaceAll("""(?i)\bsystem\.zeros_mt\b""",
      "(SELECT CAST(0 AS TINYINT) AS zero FROM RANGE(100000000))")
    q = q.replaceAll("""(?i)\bsystem\.zeros\b""",
      "(SELECT CAST(0 AS TINYINT) AS zero FROM RANGE(100000000))")

    // SQL lambda UDF macros first — bodies then flow through the dialect
    q = expandMacros(q)

    // array literals before anything else
    q = rewriteArrayLiterals(q)
    q = rewriteMapLiterals(q)
    q = rewriteTernary(q)

    // MySQL-compat / composite IP names canonicalize to their CH forms
    // BEFORE the IP templates fire (rewrites run in source order)
    for ((compat, chName) <- Seq(
        "INET_ATON" -> "IPv4StringToNum", "INET_NTOA" -> "IPv4NumToString",
        "INET6_ATON" -> "IPv6StringToNum", "INET6_NTOA" -> "IPv6NumToString",
        // round-10 batch 26: the remaining MySQL-compat (case-insensitive
        // in the reference) spellings canonicalize to their CH names
        // before the templates fire
        "FORMAT_BYTES" -> "formatReadableSize",
        "FROM_BASE64" -> "base64Decode", "TO_BASE64" -> "base64Encode",
        "FROM_DAYS" -> "fromDaysSinceYearZero",
        "TO_DAYS" -> "toDaysSinceYearZero",
        "FROM_UNIXTIME" -> "fromUnixTimestamp",
        "TO_UNIXTIME" -> "toUnixTimestamp",
        "REGEXP_MATCHES" -> "match",
        "DATE_DIFF" -> "dateDiff", "TIMESTAMP_DIFF" -> "dateDiff",
        "MILLISECOND" -> "toMillisecond",
        "SUBSTRING_INDEX" -> "substringIndex",
        "YYYYMMDDhhmmssToDateTime64" -> "YYYYMMDDhhmmssToDateTime",
        "aes_encrypt_mysql" -> "encrypt", "aes_decrypt_mysql" -> "decrypt",
        "extractKeyValuePairsWithEscaping" -> "extractKeyValuePairs",
        // round-10 batch 30: registered alias of extractKeyValuePairs
        // (reference extractKeyValuePairs.cpp:255)
        "mapFromString" -> "extractKeyValuePairs"))
      // the reference registers the MySQL-compat names CASE-INSENSITIVE
      // (FunctionFactory::registerFunction Case::Insensitive) — 00232
      // spells format_bytes in lowercase
      q = q.replaceAll(s"(?i)\\b$compat\\s*\\(", chName + "(")
    // IPv4ToIPv6(num): the IPv4-mapped ::ffff:a.b.c.d address — emit
    // IPv4NumToString(...) so the later template expands it
    q = rewriteCalls(q, "IPv4ToIPv6")(a =>
      s"ipv6_string_to_num(concat('::ffff:', IPv4NumToString(${a(0)})))")
    // UTF8-suffixed variants whose base name shares the same Spark
    // rendering canonicalize to the base (occurrence counts, token
    // splits and distance metrics are the same in bytes or code points
    // on the inputs both engines accept); runs before templates so
    // template-backed bases still expand. substring/reverse/left/right/
    // position* are NOT here: their base names are BYTE-based in the
    // reference and the UTF8 variants char-based, so each side gets its
    // own rewrite below.
    for (base <- Seq("editDistance",
        "levenshteinDistance", "hasSubsequence", "hasSubsequenceCaseInsensitive",
        "multiSearchAny", "ngramDistance", "ngramSearch",
        "countSubstrings", "splitByChar",
        // round-10 batch 20: the remaining *UTF8 spellings whose base is
        // position-free or whose positions are char-based already
        // (multiSearch* positions are code points in the UTF8 variants —
        // Spark's instr counts chars, so the UTF8 spelling is the native
        // one and the canonicalization is exact on ASCII)
        "multiSearchAnyCaseInsensitive", "multiSearchFirstIndex",
        "multiSearchFirstIndexCaseInsensitive", "multiSearchFirstPosition",
        "multiSearchFirstPositionCaseInsensitive", "multiSearchAllPositions",
        "multiSearchAllPositionsCaseInsensitive",
        "ngramDistanceCaseInsensitive", "ngramSearchCaseInsensitive"))
      q = q.replaceAll(s"\\b${base}UTF8\\s*\\(", base + "(")
    // URL RFC spellings (strict RFC 3986 host parse) canonicalize to the
    // base parser — parse_url is URI-based already; runs early so the
    // base templates still see them (round-10 batch 22)
    for (base <- Seq("domainWithoutWWW", "domain", "topLevelDomain", "port"))
      q = q.replaceAll(s"\\b${base}RFC\\s*\\(", base + "(")

    // CH base string ops act on BYTES; only the *UTF8 variants measure
    // code points (reference src/Functions/substring.cpp:34 "If
    // 'is_utf8' - measure offset and length in code points instead of
    // bytes"; position.cpp likewise; reverse.cpp reverses raw bytes —
    // ch_reverse; length.cpp counts bytes — ch_length's string branch)
    // and upper/lower fold ASCII 'a'..'z' ONLY (LowerUpperImpl.h:31
    // flip_case_mask over the bounded range; upperUTF8/lowerUTF8 are the
    // Unicode folds). Spark strings are char-based, so the byte ops go
    // through BINARY casts, ASCII translate, and byte-counting rewrites.
    // On pure ASCII both coincide; the utf8 fuzz mode diffs the rest.
    // These run on the user's text only, BEFORE any template emits
    // Spark-native substring/lower/... (rewriteCalls never rescans
    // template output).
    val asciiLower = (x: String) =>
      s"translate($x, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"
    val asciiUpper = (x: String) =>
      s"translate($x, 'abcdefghijklmnopqrstuvwxyz', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ')"
    for (n <- Seq("lower", "lcase")) q = rewriteCalls(q, n)(a => asciiLower(a(0)))
    for (n <- Seq("upper", "ucase")) q = rewriteCalls(q, n)(a => asciiUpper(a(0)))
    val byteSubstr = (a: Seq[String]) => {
      val bin = s"cast(cast(${a(0)} AS STRING) AS BINARY)"
      if (a.length >= 3) s"cast(substring($bin, ${a(1)}, ${a(2)}) AS STRING)"
      else s"cast(substring($bin, ${a(1)}) AS STRING)"
    }
    for (n <- Seq("substring", "substr", "mid")) q = rewriteCalls(q, n)(byteSubstr)
    // left/right count bytes; a negative n drops |n| bytes from the
    // other end (reference src/Functions/LeftRight.h)
    q = rewriteCalls(q, "left")(a => {
      val s = s"cast(${a(0)} AS STRING)"
      s"cast(substring(cast($s AS BINARY), 1, CASE WHEN ${a(1)} >= 0 THEN ${a(1)} " +
        s"ELSE greatest(octet_length($s) + ${a(1)}, 0) END) AS STRING)"
    })
    q = rewriteCalls(q, "right")(a => {
      val s = s"cast(${a(0)} AS STRING)"
      val r = s"(CASE WHEN ${a(1)} >= 0 THEN least(${a(1)}, octet_length($s)) " +
        s"ELSE greatest(octet_length($s) + ${a(1)}, 0) END)"
      s"cast(substring(cast($s AS BINARY), octet_length($s) - $r + 1, $r) AS STRING)"
    })
    q = rewriteCalls(q, "reverse")(a => s"ch_reverse(${a(0)})")

    // CH length() is polymorphic over String AND Array/Map (reference
    // src/Functions/array/length.cpp); Spark splits it into length/size.
    // ch_length (a RuntimeReplaceable) dispatches on the resolved type.
    // Runs early, on the user's text only — Spark-native length() emitted
    // by later templates is untouched. Found by the dialect fuzzer.
    q = rewriteCalls(q, "length")(a => s"ch_length(${a(0)})")

    // count() -> count(*) (case-insensitive: the perf corpus spells
    // COUNT()/Count() too; allow whitespace before the parens)
    q = q.replaceAll("""(?i)\bcount\s*\(\s*\)""", "count(*)")

    // GLOBAL IN / GLOBAL JOIN are distribution hints in the reference;
    // Spark's optimizer owns distribution — drop the modifier.
    q = q.replaceAll("""(?i)\bGLOBAL\s+(IN|NOT\s+IN|JOIN|ANY|ALL|SEMI|ANTI)\b""", "$1")
    // non-finite -> integer conversion and s2 coordinate validation
    // happen BEFORE the literal substitution, while the nan/inf token is
    // still visible (reference FunctionsConversion: CANNOT_CONVERT_TYPE;
    // s2 functions validate degrees)
    if ("(?i)\\bto(?:U?Int)(?:8|16|32|64|128|256)\\s*\\(\\s*[+-]?(?:inf|infinity|nan)\\s*\\)".r
        .findFirstIn(q).isDefined)
      throw new IllegalArgumentException(
        "CANNOT_CONVERT_TYPE: unexpected inf or nan to integer conversion")
    if ("(?i)\\bs2\\w+\\s*\\([^()]*(?<![\\w.`'])(?:inf|infinity|nan)(?![\\w`'])".r
        .findFirstIn(q).isDefined)
      throw new IllegalArgumentException(
        "BAD_ARGUMENTS: invalid (non-finite) coordinate for an S2 function")
    // bare nan / inf / infinity are Float64 LITERALS in the reference
    // (ParserNumber), not identifiers; quote- and alias-aware
    if ("(?i)\\b(nan|inf|infinity)\\b".r.findFirstIn(q).isDefined) {
      val litRe = "(?i)(?<![\\w.`'])(nan|inf|infinity)(?![\\w`'(])".r
      val sb = new StringBuilder; var last = 0
      for (m <- litRe.findAllMatchIn(q)) {
        sb.append(q.substring(last, m.start))
        val before = q.substring(0, m.start)
        val inStr = before.count(_ == '\'') % 2 == 1
        val isAlias = "(?is).*\\bAS\\s+$".r.pattern.matcher(before).matches
        sb.append(
          if (inStr || isAlias) m.matched
          else if (m.group(1).equalsIgnoreCase("nan")) "CAST('NaN' AS DOUBLE)"
          else "CAST('Infinity' AS DOUBLE)")
        last = m.end
      }
      sb.append(q.substring(last)); q = sb.toString
    }
    // CH spells the semi/anti qualifier BEFORE the side (ParserJoin:
    // SEMI LEFT JOIN); Spark wants LEFT SEMI JOIN
    q = q.replaceAll("(?i)\\bSEMI\\s+LEFT(\\s+OUTER)?\\s+JOIN\\b", "LEFT SEMI JOIN")
    q = q.replaceAll("(?i)\\bANTI\\s+LEFT(\\s+OUTER)?\\s+JOIN\\b", "LEFT ANTI JOIN")

    // ALL JOIN strictness modifier (reference Joins.h All) is Spark's
    // default join semantics — drop it.
    q = q.replaceAll("""(?i)\bALL\s+(INNER|LEFT|RIGHT|FULL)\b""", "$1")

    // templates (argument-restructuring rewrites) — before plain aliases
    // round-10 batch 29: aggregate spelling tail (runs first — its
    // emitted Spark HOFs are names no later CH template reshapes)
    q = rewriteAggSpellings(q)
    // round-10 batch 30: scalar/introspection tail
    q = rewriteScalarTail(q)
    // round-10 batch 31: PromQL-style grid aggregates
    q = rewriteTimeSeriesGrid(q)
    // CH higher-order fns take the LAMBDA first; Spark takes the array first.
    q = rewriteCalls(q, "arrayMap")(a => s"transform(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "arrayFilter")(a => s"filter(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "arrayExists")(a =>
      if (a.length == 2) s"exists(${a(1)}, ${a(0)})" else s"exists(${a(0)}, x -> x)")
    q = rewriteCalls(q, "arrayAll")(a =>
      if (a.length == 2) s"forall(${a(1)}, ${a(0)})" else s"forall(${a(0)}, x -> x)")
    q = rewriteCalls(q, "arrayCount")(a =>
      if (a.length == 2) s"size(filter(${a(1)}, ${a(0)}))" else s"size(filter(${a(0)}, x -> x))")
    q = rewriteCalls(q, "arraySum")(a =>
      if (a.length == 2) s"aggregate(${a(1)}, CAST(0 AS DOUBLE), (acc, x) -> acc + ${a(0)}(x))"
      else s"aggregate(${a(0)}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    // empty arrays yield the ELEMENT-TYPE DEFAULT, not NULL (reference
    // arrayAggregation.cpp): min/max of [] is 0 / '' / epoch
    for ((nm, sp) <- Seq("arrayMin" -> "array_min", "arrayMax" -> "array_max"))
      q = rewriteCalls(q, nm)(a =>
        if (a.length == 2)
          s"coalesce($sp(transform(${a(1)}, ${a(0)})), " +
            s"ch_first_default(transform(${a(1)}, ${a(0)})))"
        else s"coalesce($sp(${a(0)}), ch_first_default(${a(0)}))")
    q = rewriteCalls(q, "intDiv")(a => s"((${a(0)}) div (${a(1)}))")
    // CH divide(): float division, x/0 -> ±Inf, 0/0 -> NaN (never error)
    q = rewriteCalls(q, "divide")(a =>
      s"(CASE WHEN CAST(${a(1)} AS DOUBLE) = 0.0 THEN " +
        s"CASE WHEN CAST(${a(0)} AS DOUBLE) > 0.0 THEN CAST('Infinity' AS DOUBLE) " +
        s"WHEN CAST(${a(0)} AS DOUBLE) < 0.0 THEN CAST('-Infinity' AS DOUBLE) " +
        s"ELSE CAST('NaN' AS DOUBLE) END " +
        s"ELSE CAST(${a(0)} AS DOUBLE) / CAST(${a(1)} AS DOUBLE) END)")
    // CH toDayOfWeek default mode is ISO Monday=1..Sunday=7; Spark's
    // dayofweek is Sunday=1 — use weekday() (Monday=0) + 1 instead.
    q = rewriteCalls(q, "toDayOfWeek")(a => s"(weekday(${a(0)}) + 1)")
    // position* return BYTE offsets (reference src/Functions/position.cpp
    // vs positionUTF8.cpp): find the char position, then count the bytes
    // of the char prefix before the match. Case-insensitive variant folds
    // ASCII only (byte widths preserved, so the prefix count stays valid).
    val bytePos = (h: String, n: String, fold: String => String) => {
      val at = s"instr(${fold(h)}, ${fold(n)})"
      s"(CASE WHEN $at = 0 THEN 0 ELSE octet_length(substring($h, 1, $at - 1)) + 1 END)"
    }
    q = rewriteCalls(q, "positionCaseInsensitive")(a =>
      bytePos(a(0), a(1), asciiLower))
    q = rewriteCalls(q, "positionCaseInsensitiveUTF8")(a =>
      s"instr(lower(${a(0)}), lower(${a(1)}))")
    // the UTF8 variants compare CODE POINTS: a needle that is not valid
    // UTF-8 (a lone continuation byte) can never match (02833)
    q = rewriteCalls(q, "startsWithUTF8")(a =>
      s"(startswith(${a(0)}, ${a(1)}) AND is_valid_utf8(${a(1)}))")
    q = rewriteCalls(q, "endsWithUTF8")(a =>
      s"(endswith(${a(0)}, ${a(1)}) AND is_valid_utf8(${a(1)}))")
    // CH dateDiff('day', a, b): unit arrives as a string literal; Spark's
    // timestampdiff needs a bare unit identifier. CH counts unit-BOUNDARY
    // crossings while timestampdiff counts full elapsed units, so both
    // sides are truncated to the unit first ('2024-01-01 23:00' ->
    // '2024-01-02 01:00' must be 1 day, not 0). CH age() IS the
    // elapsed-units semantics, so it maps to bare timestampdiff.
    // unit alias grid (reference dateDiff.cpp DateDiffImpl: plural and
    // abbreviated spellings all fold to the canonical unit)
    val unitCanon = Map(
      "YEARS" -> "YEAR", "YYYY" -> "YEAR", "YY" -> "YEAR",
      "QUARTERS" -> "QUARTER", "QQ" -> "QUARTER", "Q" -> "QUARTER",
      "MONTHS" -> "MONTH", "MM" -> "MONTH", "M" -> "MONTH",
      "WEEKS" -> "WEEK", "WK" -> "WEEK", "WW" -> "WEEK",
      "DAYS" -> "DAY", "DD" -> "DAY", "D" -> "DAY",
      "HOURS" -> "HOUR", "HH" -> "HOUR", "H" -> "HOUR",
      "MINUTES" -> "MINUTE", "MI" -> "MINUTE", "N" -> "MINUTE",
      "SECONDS" -> "SECOND", "SS" -> "SECOND", "S" -> "SECOND",
      "MILLISECONDS" -> "MILLISECOND", "MS" -> "MILLISECOND",
      "MICROSECONDS" -> "MICROSECOND", "MCS" -> "MICROSECOND",
      "US" -> "MICROSECOND")
    val stripUnit = (u: String) => {
      val s = u.replaceAll("'", "").trim.toUpperCase
      unitCanon.getOrElse(s, s)
    }
    val ddiff = (a: Seq[String]) => {
      val u = stripUnit(a(0))
      // sub-second units: Spark's timestampdiff stops at SECOND, so diff
      // the truncated instants in microseconds (CH counts boundary
      // crossings; DateTime carries at most microsecond precision, so
      // the nanosecond count is the microsecond count * 1000)
      def microsDiff(scale: Long, trunc: String): String =
        s"((unix_micros(CAST(date_trunc('$trunc', ${a(2)}) AS TIMESTAMP)) - " +
          s"unix_micros(CAST(date_trunc('$trunc', ${a(1)}) AS TIMESTAMP))) " +
          (if (scale == 1L) ")" else s"* $scale)")
      u match {
        case "MILLISECOND" =>
          s"(${microsDiff(1, "MILLISECOND")} DIV 1000)"
        case "MICROSECOND" => microsDiff(1, "MICROSECOND")
        case "NANOSECONDS" | "NANOSECOND" | "NS" =>
          microsDiff(1000, "MICROSECOND")
        case _ =>
          s"timestampdiff($u, date_trunc('$u', ${a(1)}), date_trunc('$u', ${a(2)}))"
      }
    }
    q = rewriteCalls(q, "dateDiff")(ddiff)
    q = rewriteCalls(q, "date_diff")(ddiff)
    // exact aliases of dateDiff in the reference (dateDiff.cpp:469-471)
    q = rewriteCalls(q, "timestampDiff")(ddiff)
    q = rewriteCalls(q, "timestampdiff")(ddiff)
    q = rewriteCalls(q, "TIMESTAMPDIFF")(ddiff)
    q = rewriteCalls(q, "timestamp_diff")(ddiff)
    q = rewriteCalls(q, "position")(a => bytePos(a(0), a(1), identity))
    // CH *If combinators return the TYPE DEFAULT on an empty match set
    // (reference AggregateFunctionIf: non-Nullable result), not NULL:
    // sumIf -> 0, avgIf -> nan. Mirrored for the numeric combinators
    // (found by the aggregate fuzzer: sumIf over a no-match group
    // returned NULL). minIf/maxIf keep SQL NULL — the CH default (0/'')
    // is type-dependent and not expressible in a text template; this is
    // a documented deliberate divergence.
    q = rewriteCalls(q, "sumIf")(a =>
      s"coalesce(sum(CASE WHEN ${a(1)} THEN ${a(0)} END), 0)")
    q = rewriteCalls(q, "countIf")(a => s"count(CASE WHEN ${a(0)} THEN 1 END)")
    q = rewriteCalls(q, "avgIf")(a =>
      s"coalesce(avg(CASE WHEN ${a(1)} THEN ${a(0)} END), CAST('NaN' AS DOUBLE))")
    q = rewriteCalls(q, "minIf")(a => s"min(CASE WHEN ${a(1)} THEN ${a(0)} END)")
    q = rewriteCalls(q, "maxIf")(a => s"max(CASE WHEN ${a(1)} THEN ${a(0)} END)")
    // avgWeightedIf(v, w, cond): weighted mean of the matching subset
    // (avg_weighted.xml); CH truthiness — a numeric cond is `!= 0`
    q = rewriteCalls(q, "avgWeightedIf") { a =>
      val c = s"coalesce(CAST((${a(2)}) AS BOOLEAN), false)"
      s"(sum(CASE WHEN $c THEN (${a(0)}) * (${a(1)}) END) / " +
        s"sum(CASE WHEN $c THEN ${a(1)} END))"
    }
    // anyIf: first non-NULL of the matching subset (reference
    // AggregateFunctionIf over any — NULL-skipping)
    q = rewriteCalls(q, "anyIf")(a =>
      s"any_value(CASE WHEN ${a(1)} THEN ${a(0)} END, true)")
    // joinGet('t', 'col', k…): lookup into an ENGINE = Join table by its
    // declared key columns (reference StorageJoin::joinGet) — a
    // correlated scalar subquery over the (small, by design) join table
    q = rewriteCalls(q, "joinGet") { a =>
      val tbl = a(0).trim.stripPrefix("'").stripSuffix("'")
        .stripPrefix("default.").stripPrefix("`").stripSuffix("`")
      val cn = a(1).trim.stripPrefix("'").stripSuffix("'")
      if (cn.isEmpty) throw new IllegalArgumentException(
        s"NO_SUCH_COLUMN_IN_TABLE: joinGet: empty column name for '$tbl'")
      joinEngineKeys.get(tbl) match {
        case Some((kind, _)) if kind != "LEFT" =>
          throw new IllegalArgumentException(
            s"INCOMPATIBLE_TYPE_OF_JOIN: joinGet needs an ANY LEFT Join table, '$tbl' is $kind")
        case Some((_, ks)) if ks.length == a.length - 2 =>
          val cond = ks.zip(a.drop(2)).map { case (k, v) => s"`$k` = ($v)" }
            .mkString(" AND ")
          s"(SELECT any_value(`$cn`, true) FROM $tbl WHERE $cond)"
        case _ => throw new IllegalArgumentException(
          s"joinGet: '$tbl' is not a known Join-engine table with ${a.length - 2} key(s)")
      }
    }
    // joinGetOrNull: like joinGet but a missed key yields NULL — except
    // Array columns, which are never Nullable in the reference and yield
    // [] (01240 pins both shapes)
    q = rewriteCalls(q, "joinGetOrNull") { a =>
      val tbl = a(0).trim.stripPrefix("'").stripSuffix("'")
        .stripPrefix("default.").stripPrefix("`").stripSuffix("`")
      val cn = a(1).trim.stripPrefix("'").stripSuffix("'")
      joinEngineKeys.get(tbl) match {
        case Some((kind, _)) if kind != "LEFT" =>
          throw new IllegalArgumentException(
            s"INCOMPATIBLE_TYPE_OF_JOIN: joinGetOrNull needs an ANY LEFT Join table, '$tbl' is $kind")
        case Some((_, ks)) if ks.length == a.length - 2 =>
          val cond = ks.zip(a.drop(2)).map { case (k, v) => s"`$k` = ($v)" }
            .mkString(" AND ")
          // if(true, x, NULL) makes the aggregated child NULLABLE so the
          // empty-set type-default rule leaves the miss as NULL (01240)
          val base =
            s"(SELECT any_value(if(true, `$cn`, NULL), true) FROM $tbl WHERE $cond)"
          val declared = tableColMeta.get(tbl)
            .flatMap(_.collectFirst { case (n, t, _, _) if n == cn => t })
          declared match {
            case Some(t) if t.trim.startsWith("Array(") =>
              val sp = try ChTypes.toSpark(t.trim).sql
                catch { case _: Exception => "ARRAY<STRING>" }
              s"coalesce($base, CAST(array() AS $sp))"
            case _ => base
          }
        case _ => throw new IllegalArgumentException(
          s"joinGetOrNull: '$tbl' is not a known Join-engine table with ${a.length - 2} key(s)")
      }
    }
    // uniq*If: cardinality of the matching subset; 0 (type default) on
    // an empty match set comes free (count distinct of no rows is 0)
    // multi-value forms hash the tuple: wrap in struct so the CASE stays
    // a single expression (splicing "a, b" into one CASE branch is a
    // Spark parse error)
    def uniqIfVal(a: Seq[String]): String = {
      val vs = a.dropRight(1)
      if (vs.length == 1) vs.head else s"struct(${vs.mkString(", ")})"
    }
    q = rewriteCalls(q, "uniqIf")(a =>
      s"approx_count_distinct(CASE WHEN ${a.last} THEN ${uniqIfVal(a)} END)")
    q = rewriteCalls(q, "uniqExactIf")(a =>
      s"count(DISTINCT CASE WHEN ${a.last} THEN ${uniqIfVal(a)} END)")
    q = rewriteCalls(q, "uniqExact")(a => s"count(DISTINCT ${a.mkString(", ")})")
    // replicate(x, arr): internal function materializing a constant into
    // an array of arr's shape (reference src/Functions/replicate.cpp)
    q = rewriteCalls(q, "replicate")(a =>
      s"transform(${a(1)}, __r_elem -> ${a(0)})")
    q = rewriteCalls(q, "toString")(a => s"cast(${a(0)} AS string)")
    q = rewriteCalls(q, "toInt64")(a => s"cast(${a(0)} AS bigint)")
    q = rewriteCalls(q, "toInt32")(a => s"cast(${a(0)} AS int)")
    q = rewriteCalls(q, "toFloat64")(a => s"cast(${a(0)} AS double)")
    // CH String->number parsing (reference src/Functions/FunctionsConversion.h
    // ConvertThroughParsing + src/IO/ReadHelpers.h:353 readIntTextImpl,
    // src/IO/readFloatText.h:324): the OrZero/OrNull family requires FULL
    // consumption (isAllRead at FunctionsConversion.h:1100) with NO
    // whitespace skip, a single optional sign, and CHECKED overflow
    // (tryReadIntText defaults CHECK_OVERFLOW). Spark's try_cast trims
    // whitespace, truncates '12.5' to 12, and accepts Java float forms
    // ('1.5d', hex floats) — so every template guards with the exact CH
    // grammar first. Floats add [eE][+-]digits exponents and
    // case-insensitive inf/infinity/nan. Documented divergences: CH's
    // degenerate zero-forms ('.', 'e5', '1e+') parse as 0.0 there but
    // fail the guard here (identical under OrZero, NULL vs 0.0 under
    // OrNull); UInt64 values above 2^63-1 exceed the BIGINT domain (NULL
    // here, same declared clamp as toUInt64); numeric arguments are an
    // ILLEGAL TYPE in CH (throws) but render through STRING here.
    val chIntRe = "^[+-]?[0-9]+$"
    val chUIntRe = "^[+]?[0-9]+$"
    def chStr(x: String) = s"cast($x AS STRING)"
    def intParse(x: String, sqlType: String): String = {
      val s = chStr(x)
      s"(CASE WHEN $s RLIKE '$chIntRe' THEN try_cast($s AS $sqlType) END)"
    }
    def uintParse(x: String, maxU: Option[Long]): String = {
      val s = chStr(x)
      val bound = maxU.map(m => s" AND try_cast($s AS BIGINT) <= ${m}L").getOrElse("")
      s"(CASE WHEN $s RLIKE '$chUIntRe'$bound THEN try_cast($s AS BIGINT) END)"
    }
    val chFloatRe = "^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)([eE][+-]?[0-9]+)?$"
    def floatParse(x: String, sqlType: String): String = {
      val s = chStr(x)
      s"(CASE WHEN $s RLIKE '^[+-]?(?i)inf(inity)?$$' THEN " +
        s"CAST(CASE WHEN $s LIKE '-%' THEN '-Infinity' ELSE 'Infinity' END AS $sqlType) " +
        s"WHEN $s RLIKE '^[+-]?(?i)nan$$' THEN CAST('NaN' AS $sqlType) " +
        s"WHEN $s RLIKE '$chFloatRe' THEN cast($s AS $sqlType) END)"
    }
    def orZero(inner: String, sqlType: String): String =
      s"CAST(coalesce($inner, 0) AS $sqlType)"
    for ((n, t) <- Seq("toInt8OrNull" -> "TINYINT", "toInt16OrNull" -> "SMALLINT",
        "toInt32OrNull" -> "INT", "toInt64OrNull" -> "BIGINT"))
      q = rewriteCalls(q, n)(a => intParse(a(0), t))
    for ((n, t) <- Seq("toInt8OrZero" -> "TINYINT", "toInt16OrZero" -> "SMALLINT",
        "toInt32OrZero" -> "INT", "toInt64OrZero" -> "BIGINT"))
      q = rewriteCalls(q, n)(a => orZero(intParse(a(0), t), t))
    for ((n, m) <- Seq("toUInt8OrNull" -> Some(255L), "toUInt16OrNull" -> Some(65535L),
        "toUInt32OrNull" -> Some(4294967295L), "toUInt64OrNull" -> None))
      q = rewriteCalls(q, n)(a => uintParse(a(0), m))
    for ((n, m) <- Seq("toUInt8OrZero" -> Some(255L), "toUInt16OrZero" -> Some(65535L),
        "toUInt32OrZero" -> Some(4294967295L), "toUInt64OrZero" -> None))
      q = rewriteCalls(q, n)(a => orZero(uintParse(a(0), m), "BIGINT"))
    for ((n, t) <- Seq("toFloat32OrNull" -> "FLOAT", "toFloat64OrNull" -> "DOUBLE"))
      q = rewriteCalls(q, n)(a => floatParse(a(0), t))
    for ((n, t) <- Seq("toFloat32OrZero" -> "FLOAT", "toFloat64OrZero" -> "DOUBLE"))
      q = rewriteCalls(q, n)(a => orZero(floatParse(a(0), t), t))
    // OrDefault = OrNull with a caller fallback (FunctionsConversion.h
    // FunctionCastOrDefault); one-arg form falls back to the type default
    q = rewriteCalls(q, "toInt32OrDefault")(a =>
      if (a.length >= 2) s"coalesce(${intParse(a(0), "INT")}, ${a(1)})"
      else orZero(intParse(a(0), "INT"), "INT"))
    q = rewriteCalls(q, "toInt64OrDefault")(a =>
      if (a.length >= 2) s"coalesce(${intParse(a(0), "BIGINT")}, ${a(1)})"
      else orZero(intParse(a(0), "BIGINT"), "BIGINT"))
    q = rewriteCalls(q, "toUInt64OrDefault")(a =>
      if (a.length >= 2) s"coalesce(${uintParse(a(0), None)}, ${a(1)})"
      else orZero(uintParse(a(0), None), "BIGINT"))
    q = rewriteCalls(q, "toFloat64OrDefault")(a =>
      if (a.length >= 2) s"coalesce(${floatParse(a(0), "DOUBLE")}, ${a(1)})"
      else orZero(floatParse(a(0), "DOUBLE"), "DOUBLE"))

    // ---- round-10 batch 19: the remaining conversion spellings ----
    // (reference FunctionsConversion.h: FunctionCastOrDefault /
    // ConvertThroughParsing over the targets not yet covered above)
    // complete the narrow OrDefault grid (2-arg = caller default,
    // 1-arg = the type default, i.e. the OrZero value)
    for ((n, t) <- Seq("toInt8OrDefault" -> "TINYINT",
        "toInt16OrDefault" -> "SMALLINT"))
      q = rewriteCalls(q, n)(a =>
        if (a.length >= 2) s"coalesce(${intParse(a(0), t)}, ${a(1)})"
        else orZero(intParse(a(0), t), t))
    for ((n, m) <- Seq("toUInt8OrDefault" -> Some(255L),
        "toUInt16OrDefault" -> Some(65535L),
        "toUInt32OrDefault" -> Some(4294967295L)))
      q = rewriteCalls(q, n)(a =>
        if (a.length >= 2) s"coalesce(${uintParse(a(0), m)}, ${a(1)})"
        else orZero(uintParse(a(0), m), "BIGINT"))
    q = rewriteCalls(q, "toFloat32OrDefault")(a =>
      if (a.length >= 2) s"coalesce(${floatParse(a(0), "FLOAT")}, ${a(1)})"
      else orZero(floatParse(a(0), "FLOAT"), "FLOAT"))
    // CH date/datetime string parse (src/IO/ReadHelpers.h readDateText /
    // readDateTimeText: strict 'YYYY-MM-DD[ hh:mm:ss[.frac]]', full
    // consumption) with the reference's SATURATING range semantics
    // (FunctionsConversion.h date_time_overflow_behavior = saturate:
    // Date clamps to [1970-01-01, 2149-06-06], Date32 to
    // [1900-01-01, 2299-12-31], DateTime to [1970, 2106-02-07 06:28:15])
    val chDateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
    val chDateTimeRe =
      "^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}([.][0-9]+)?$"
    def dateParse(x: String, lo: String, hi: String): String = {
      val s = chStr(x)
      s"(CASE WHEN $s RLIKE '$chDateRe' THEN " +
        s"least(greatest(try_cast($s AS DATE), DATE'$lo'), DATE'$hi') END)"
    }
    def dateTimeParse(x: String): String = {
      val s = chStr(x)
      s"(CASE WHEN $s RLIKE '$chDateTimeRe' OR $s RLIKE '$chDateRe' THEN " +
        s"least(greatest(try_cast($s AS TIMESTAMP), " +
        s"TIMESTAMP'1970-01-01 00:00:00'), TIMESTAMP'2106-02-07 06:28:15') END)"
    }
    q = rewriteCalls(q, "toDateOrZero")(a =>
      s"coalesce(${dateParse(a(0), "1970-01-01", "2149-06-06")}, DATE'1970-01-01')")
    q = rewriteCalls(q, "toDateOrDefault")(a =>
      if (a.length >= 2)
        s"coalesce(${dateParse(a(0), "1970-01-01", "2149-06-06")}, ${a(1)})"
      else s"coalesce(${dateParse(a(0), "1970-01-01", "2149-06-06")}, DATE'1970-01-01')")
    q = rewriteCalls(q, "toDate32OrNull")(a =>
      dateParse(a(0), "1900-01-01", "2299-12-31"))
    q = rewriteCalls(q, "toDate32OrZero")(a =>
      s"coalesce(${dateParse(a(0), "1900-01-01", "2299-12-31")}, DATE'1900-01-01')")
    q = rewriteCalls(q, "toDate32OrDefault")(a =>
      if (a.length >= 2)
        s"coalesce(${dateParse(a(0), "1900-01-01", "2299-12-31")}, ${a(1)})"
      else s"coalesce(${dateParse(a(0), "1900-01-01", "2299-12-31")}, DATE'1900-01-01')")
    q = rewriteCalls(q, "toDateTimeOrZero")(a =>
      s"coalesce(${dateTimeParse(a(0))}, TIMESTAMP'1970-01-01 00:00:00')")
    q = rewriteCalls(q, "toDateTimeOrDefault")(a =>
      if (a.length >= 2) s"coalesce(${dateTimeParse(a(0))}, ${a(1)})"
      else s"coalesce(${dateTimeParse(a(0))}, TIMESTAMP'1970-01-01 00:00:00')")
    // DateTime64 lands on Spark's microsecond TIMESTAMP; a scale argument
    // beyond 6 cannot add precision (documented clamp, same as the
    // parseDateTime64 family). Signatures: (s[, scale[, tz]]) /
    // OrDefault(s, scale, default).
    q = rewriteCalls(q, "toDateTime64OrNull")(a => dateTimeParse(a(0)))
    q = rewriteCalls(q, "toDateTime64OrZero")(a =>
      s"coalesce(${dateTimeParse(a(0))}, TIMESTAMP'1970-01-01 00:00:00')")
    q = rewriteCalls(q, "toDateTime64OrDefault")(a =>
      if (a.length >= 3) s"coalesce(${dateTimeParse(a(0))}, ${a(2)})"
      else s"coalesce(${dateTimeParse(a(0))}, TIMESTAMP'1970-01-01 00:00:00')")
    // UUID: canonical lowercase 8-4-4-4-12; the all-zero UUID is the
    // type default (reference src/IO/ReadHelpers.h readUUIDTextImpl)
    val uuidRe = "^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-" +
      "[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"
    def uuidParse(x: String): String = {
      val s = chStr(x)
      s"(CASE WHEN $s RLIKE '$uuidRe' THEN lower($s) END)"
    }
    val zeroUuid = "'00000000-0000-0000-0000-000000000000'"
    q = rewriteCalls(q, "toUUIDOrNull")(a => uuidParse(a(0)))
    q = rewriteCalls(q, "toUUIDOrZero")(a =>
      s"coalesce(${uuidParse(a(0))}, $zeroUuid)")
    q = rewriteCalls(q, "toUUIDOrDefault")(a =>
      if (a.length >= 2) s"coalesce(${uuidParse(a(0))}, ${a(1)})"
      else s"coalesce(${uuidParse(a(0))}, $zeroUuid)")
    q = rewriteCalls(q, "toUUID")(a =>
      s"(CASE WHEN ${uuidParse(a(0))} IS NOT NULL THEN ${uuidParse(a(0))} " +
        s"ELSE raise_error(concat('toUUID: cannot parse ', ${chStr(a(0))})) END)")
    // IPv4/IPv6 values render as canonical strings in this engine (the
    // numeric view stays explicit via IPv4StringToNum; reference
    // DataTypeIPv4/IPv6 are value types with canonical text form)
    def ip4Canon(x: String): String = {
      val s = chStr(x)
      val oct = (i: Int) => s"try_cast(element_at(split($s, '\\\\.'), $i) AS INT)"
      s"(CASE WHEN $s RLIKE '^([0-9]{1,3}\\\\.){3}[0-9]{1,3}$$' " +
        s"AND ${oct(1)} <= 255 AND ${oct(2)} <= 255 AND ${oct(3)} <= 255 " +
        s"AND ${oct(4)} <= 255 THEN concat_ws('.', CAST(${oct(1)} AS STRING), " +
        s"CAST(${oct(2)} AS STRING), CAST(${oct(3)} AS STRING), " +
        s"CAST(${oct(4)} AS STRING)) END)"
    }
    q = rewriteCalls(q, "toIPv4OrNull")(a => ip4Canon(a(0)))
    q = rewriteCalls(q, "toIPv4OrZero")(a =>
      s"coalesce(${ip4Canon(a(0))}, '0.0.0.0')")
    q = rewriteCalls(q, "toIPv4OrDefault")(a =>
      if (a.length >= 2) s"coalesce(${ip4Canon(a(0))}, ${a(1)})"
      else s"coalesce(${ip4Canon(a(0))}, '0.0.0.0')")
    q = rewriteCalls(q, "toIPv4")(a =>
      s"(CASE WHEN ${ip4Canon(a(0))} IS NOT NULL THEN ${ip4Canon(a(0))} " +
        s"ELSE raise_error(concat('toIPv4: cannot parse ', ${chStr(a(0))})) END)")
    def ip6Canon(x: String): String =
      s"ipv6_num_to_string(ipv6_string_to_num(${chStr(x)}))"
    q = rewriteCalls(q, "toIPv6OrNull")(a => ip6Canon(a(0)))
    q = rewriteCalls(q, "toIPv6OrZero")(a => s"coalesce(${ip6Canon(a(0))}, '::')")
    q = rewriteCalls(q, "toIPv6OrDefault")(a =>
      if (a.length >= 2) s"coalesce(${ip6Canon(a(0))}, ${a(1)})"
      else s"coalesce(${ip6Canon(a(0))}, '::')")
    q = rewriteCalls(q, "toIPv6")(a =>
      s"coalesce(${ip6Canon(a(0))}, " +
        s"raise_error(concat('toIPv6: cannot parse ', ${chStr(a(0))})))")
    // toBool (reference parseBoolText: the word spellings; numerics are
    // x != 0 via the implicit conversion)
    q = rewriteCalls(q, "toBool")(a => {
      val s = chStr(a(0))
      s"(CASE WHEN lower($s) IN ('true','t','yes','y','on','enable','enabled','1') THEN true " +
        s"WHEN lower($s) IN ('false','f','no','n','off','disable','disabled','0') THEN false " +
        s"WHEN try_cast($s AS DOUBLE) IS NOT NULL THEN try_cast($s AS DOUBLE) <> 0.0 END)"
    })
    // toFixedString(s, n): NUL-pad to n, throw when longer (reference
    // FunctionToFixedString). rpad counts chars — identical to the
    // reference's bytes on ASCII; multibyte divergence documented.
    q = rewriteCalls(q, "toFixedString")(a => {
      val s = chStr(a(0))
      s"(CASE WHEN octet_length($s) > ${a(1)} THEN " +
        s"raise_error('toFixedString: value too long') " +
        s"ELSE rpad($s, ${a(1)}, chr(0)) END)"
    })
    // Decimal targets: DECIMAL(9|18|38, s). Decimal256's 76 digits exceed
    // Spark's maximum precision — renders at DECIMAL(38, s) (documented
    // best-effort, same declared clamp as the 128/256-bit integers below).
    for ((n, p) <- Seq("toDecimal32" -> 9, "toDecimal64" -> 18,
        "toDecimal128" -> 38, "toDecimal256" -> 38)) {
      q = rewriteCalls(q, n + "OrNull")(a =>
        s"try_cast(${chStr(a(0))} AS DECIMAL($p, ${clampScale(a(1), p)}))")
      q = rewriteCalls(q, n + "OrZero")(a =>
        s"coalesce(try_cast(${chStr(a(0))} AS DECIMAL($p, ${clampScale(a(1), p)})), " +
          s"CAST(0 AS DECIMAL($p, ${clampScale(a(1), p)})))")
      q = rewriteCalls(q, n + "OrDefault")(a =>
        if (a.length >= 3)
          s"coalesce(try_cast(${chStr(a(0))} AS DECIMAL($p, ${clampScale(a(1), p)})), ${a(2)})"
        else s"coalesce(try_cast(${chStr(a(0))} AS DECIMAL($p, ${clampScale(a(1), p)})), " +
          s"CAST(0 AS DECIMAL($p, ${clampScale(a(1), p)})))")
    }
    q = rewriteCalls(q, "toDecimal256")(a =>
      s"CAST(${a(0)} AS DECIMAL(38, ${clampScale(a(1), 38)}))")
    // 128/256-bit integers land on DECIMAL(38,0) — exact to 10^38-1
    // (SURVEY §1 "UInt128/256 best-effort"); the CH parse grammar guard
    // matches the narrow-integer family above
    def wideIntParse(x: String, unsigned: Boolean): String = {
      val s = chStr(x)
      val re = if (unsigned) chUIntRe else chIntRe
      s"(CASE WHEN $s RLIKE '$re' THEN try_cast($s AS DECIMAL(38,0)) END)"
    }
    for (n <- Seq("toInt128", "toInt256")) {
      q = rewriteCalls(q, n + "OrNull")(a => wideIntParse(a(0), unsigned = false))
      q = rewriteCalls(q, n + "OrZero")(a =>
        orZero(wideIntParse(a(0), unsigned = false), "DECIMAL(38,0)"))
      q = rewriteCalls(q, n + "OrDefault")(a =>
        if (a.length >= 2)
          s"coalesce(${wideIntParse(a(0), unsigned = false)}, ${a(1)})"
        else orZero(wideIntParse(a(0), unsigned = false), "DECIMAL(38,0)"))
      q = rewriteCalls(q, n)(a => s"CAST(${a(0)} AS DECIMAL(38,0))")
    }
    for (n <- Seq("toUInt128", "toUInt256")) {
      q = rewriteCalls(q, n + "OrNull")(a => wideIntParse(a(0), unsigned = true))
      q = rewriteCalls(q, n + "OrZero")(a =>
        orZero(wideIntParse(a(0), unsigned = true), "DECIMAL(38,0)"))
      q = rewriteCalls(q, n + "OrDefault")(a =>
        if (a.length >= 2)
          s"coalesce(${wideIntParse(a(0), unsigned = true)}, ${a(1)})"
        else orZero(wideIntParse(a(0), unsigned = true), "DECIMAL(38,0)"))
      q = rewriteCalls(q, n)(a => s"CAST(${a(0)} AS DECIMAL(38,0))")
    }
    // accurateCast family (FunctionsConversion.h accurate::convertNumeric):
    // out-of-range THROWS (accurateCast) or yields NULL/default — never
    // the wrapping toInt* truncation. Spark 4's ANSI CAST already throws
    // on numeric narrowing overflow, so the signed targets map directly;
    // the unsigned targets add an explicit range guard. Float->Int
    // truncation-vs-throw divergence is documented (ANSI truncates).
    def accCast(x: String, tArg: String, orNull: Boolean): String = {
      val ty = tArg.replaceAll("'", "").trim
      val (sqlT, loHi) = ty match {
        case "Int8" => ("TINYINT", None)
        case "Int16" => ("SMALLINT", None)
        case "Int32" => ("INT", None)
        case "Int64" => ("BIGINT", None)
        case "UInt8" => ("BIGINT", Some((0L, 255L)))
        case "UInt16" => ("BIGINT", Some((0L, 65535L)))
        case "UInt32" => ("BIGINT", Some((0L, 4294967295L)))
        case "UInt64" => ("DECIMAL(20,0)", None)
        case "Float32" => ("FLOAT", None)
        case "Float64" => ("DOUBLE", None)
        case "String" => ("STRING", None)
        case "Date" => ("DATE", None)
        case "DateTime" => ("TIMESTAMP", None)
        case d if d.startsWith("Decimal(") => (d.replace("Decimal", "DECIMAL"), None)
        // container targets route through the full CH type parser; other
        // unmapped targets keep the legacy STRING render (Nullable(...)
        // NULL-casts feed arithmetic that relies on the loose coercion)
        case c if c.startsWith("Array(") || c.startsWith("Map(") || c.startsWith("Tuple(") =>
          (try ChTypes.toSpark(c).sql catch { case _: Exception => "STRING" }, None)
        case _ => ("STRING", None)
      }
      (loHi, orNull) match {
        case (None, true) => s"try_cast($x AS $sqlT)"
        case (None, false) => s"CAST($x AS $sqlT)"
        case (Some((lo, hi)), true) =>
          s"(CASE WHEN try_cast($x AS BIGINT) BETWEEN $lo AND $hi " +
            s"THEN try_cast($x AS $sqlT) END)"
        case (Some((lo, hi)), false) =>
          s"(CASE WHEN CAST($x AS BIGINT) BETWEEN $lo AND $hi " +
            s"THEN CAST($x AS $sqlT) " +
            s"ELSE raise_error('accurateCast: value out of range') END)"
      }
    }
    q = rewriteCalls(q, "accurateCastOrNull")(a => accCast(a(0), a(1), orNull = true))
    q = rewriteCalls(q, "accurateCastOrDefault")(a =>
      if (a.length >= 3) s"coalesce(${accCast(a(0), a(1), orNull = true)}, ${a(2)})"
      else accCast(a(0), a(1), orNull = true))
    q = rewriteCalls(q, "accurateCast")(a => accCast(a(0), a(1), orNull = false))
    // representation-metadata-only conversions are the identity here:
    // Spark has no LowCardinality dictionary type, and timestamps are
    // instants rendered in the session zone (toTimeZone changes display
    // metadata, not the instant — reference src/Functions/toTimezone.cpp)
    q = rewriteCalls(q, "toLowCardinality")(a => s"(${a(0)})")
    for (n <- Seq("toTimeZone", "toTimezone"))
      q = rewriteCalls(q, n)(a => s"(${a(0)})")
    for (n <- Seq("timeZone", "timezone", "serverTimeZone"))
      q = rewriteCalls(q, n)(_ => "current_timezone()")
    for (n <- Seq("timeZoneOf", "timezoneOf"))
      q = rewriteCalls(q, n)(_ => "current_timezone()")
    // offset (seconds east of UTC) of the session zone at the instant;
    // to_utc_timestamp subtracts the zone offset, so the difference IS
    // the offset (0 under the engine's UTC default)
    for (n <- Seq("timeZoneOffset", "timezoneOffset"))
      q = rewriteCalls(q, n)(a =>
        s"CAST(unix_timestamp(CAST(${a(0)} AS TIMESTAMP)) - " +
          s"unix_timestamp(to_utc_timestamp(CAST(${a(0)} AS TIMESTAMP), " +
          s"current_timezone())) AS BIGINT)")
    q = rewriteCalls(q, "toModifiedJulianDayOrNull")(a =>
      s"datediff(try_cast(${chStr(a(0))} AS DATE), DATE'1858-11-17')")
    q = rewriteCalls(q, "fromModifiedJulianDayOrNull")(a =>
      s"date_add(DATE'1858-11-17', try_cast(${chStr(a(0))} AS INT))")
    // functional operator forms (FunctionsComparison.cpp registers
    // equals/notEquals/less/...; FunctionsLogical.cpp and/or/not/xor —
    // the reference parser itself folds infix `=` into equals())
    q = rewriteCalls(q, "equals")(a => s"(${a(0)} = ${a(1)})")
    q = rewriteCalls(q, "notEquals")(a => s"(${a(0)} <> ${a(1)})")
    q = rewriteCalls(q, "lessOrEquals")(a => s"(${a(0)} <= ${a(1)})")
    q = rewriteCalls(q, "greaterOrEquals")(a => s"(${a(0)} >= ${a(1)})")
    q = rewriteCalls(q, "less")(a => s"(${a(0)} < ${a(1)})")
    q = rewriteCalls(q, "greater")(a => s"(${a(0)} > ${a(1)})")
    // and()/or() rewrite only at >=2 args: a 1-arg match is more likely
    // the infix keyword written without a space (`x=1 and(y=2)`) than
    // the degenerate variadic call, and CH itself requires >=2
    q = rewriteCalls(q, "and")(a =>
      if (a.length >= 2) "(" + a.mkString(" AND ") + ")"
      else s"and(${a.mkString(", ")})")
    q = rewriteCalls(q, "or")(a =>
      if (a.length >= 2) "(" + a.mkString(" OR ") + ")"
      else s"or(${a.mkString(", ")})")
    q = rewriteCalls(q, "not")(a => s"(NOT (${a(0)}))")
    q = rewriteCalls(q, "xor")(a =>
      a.map(x => s"CAST($x AS BOOLEAN)").reduce((l, r) => s"($l <> $r)"))

    // CH rounding family (reference src/Functions/FunctionsRound.h):
    // result type = argument type, float path scales in binary FP with
    // banker's ties, integer negative-scale is exact integer arithmetic —
    // the ch_* dispatchers (graft.functions.ChRoundDispatch) carry the
    // semantics. Runs BEFORE any template that emits Spark floor()/round()
    // text, so only user-written names are captured.
    for ((n, fn) <- Seq("roundBankers" -> "ch_round_bankers",
        "round" -> "ch_round", "floor" -> "ch_floor", "ceil" -> "ch_ceil",
        "ceiling" -> "ch_ceil", "truncate" -> "ch_trunc", "trunc" -> "ch_trunc"))
      q = rewriteCalls(q, n)(a => s"$fn(${a.mkString(", ")})")
    // roundDown(x, [a,b,...]) (reference src/Functions/roundDown.cpp):
    // largest array element <= x; below the minimum -> the minimum
    q = rewriteCalls(q, "roundDown")(a =>
      s"coalesce(array_max(filter(${a(1)}, __rd -> __rd <= ${a(0)})), " +
        s"array_min(${a(1)}))")
    q = rewriteCalls(q, "toDate")(a => s"ch_to_date(${a(0)})")
    q = rewriteCalls(q, "toStartOfDay")(a => s"date_trunc('day', ${a(0)})")
    q = rewriteCalls(q, "toStartOfHour")(a => s"date_trunc('hour', ${a(0)})")
    q = rewriteCalls(q, "toStartOfMonth")(a => s"date_trunc('month', ${a(0)})")
    q = rewriteCalls(q, "toStartOfQuarter")(a => s"date_trunc('quarter', ${a(0)})")
    q = rewriteCalls(q, "toStartOfYear")(a => s"date_trunc('year', ${a(0)})")
    // toStartOfWeek default mode 0 = SUNDAY start returning Date (reference
    // src/Functions/toStartOfWeek — date_trunc('week') would be the mode-1
    // Monday variant); weekday(): Monday=0..Sunday=6.
    q = rewriteCalls(q, "toStartOfWeek")(a =>
      s"date_sub(CAST(${a(0)} AS DATE), (weekday(${a(0)}) + 1) % 7)")
    q = rewriteCalls(q, "splitByChar")(a => s"split(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "arrayStringConcat")(a =>
      if (a.length > 1) s"array_join(${a(0)}, ${a(1)})" else s"array_join(${a(0)}, '')")
    q = rewriteCalls(q, "multiIf") { a =>
      val cases = a.dropRight(1).grouped(2).map(p => s"WHEN ${p(0)} THEN ${p(1)}").mkString(" ")
      s"CASE $cases ELSE ${a.last} END"
    }
    // ch_length so empty/notEmpty stay polymorphic over strings AND arrays
    q = rewriteCalls(q, "empty")(a => s"(ch_length(${a(0)}) = 0)")
    q = rewriteCalls(q, "notEmpty")(a => s"(ch_length(${a(0)}) > 0)")
    q = rewriteCalls(q, "avgWeighted")(a => s"(sum((${a(0)}) * (${a(1)})) / sum(${a(1)}))")
    q = rewriteCalls(q, "arrayUniq")(a => s"size(array_distinct(${a(0)}))")
    q = rewriteCalls(q, "bitHammingDistance")(a => s"bit_count((${a(0)}) ^ (${a(1)}))")
    // range is end-EXCLUSIVE (Spark sequence is inclusive); the 1-arg
    // form guards n=0 (sequence(0, -1) would DESCEND), 3-arg keeps step
    q = rewriteCalls(q, "range") { a =>
      if (a.length == 1)
        s"slice(sequence(0, greatest((${a(0)}) - 1, 0)), 1, greatest(${a(0)}, 0))"
      else if (a.length == 2)
        // CH range(s, e) is [] when e <= s; Spark sequence would DESCEND
        s"if((${a(1)}) <= (${a(0)}), slice(sequence(${a(0)}, ${a(0)}), 1, 0), " +
          s"sequence(${a(0)}, (${a(1)}) - 1))"
      else s"sequence(${a(0)}, (${a(1)}) - 1, ${a(2)})"
    }
    // ---- batch-16 alias canonicalization (round 9) ----
    // these rewrite synonym names into the canonical CH names whose
    // templates run LATER in this method — must fire first, because each
    // rewriteCalls pass deliberately does not rescan emitted text
    q = rewriteCalls(q, "countSubstringsCaseInsensitiveUTF8")(a =>
      s"countSubstringsCaseInsensitive(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "hasSubsequenceCaseInsensitiveUTF8")(a =>
      s"hasSubsequenceCaseInsensitive(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "hasSubsequenceUTF8")(a =>
      s"hasSubsequence(${a(0)}, ${a(1)})")
    // hasToken*OrNull: NULL (not error) when the needle itself contains
    // token separators (reference hasTokenOrNull registration)
    q = rewriteCalls(q, "hasTokenCaseInsensitiveOrNull")(a =>
      s"(CASE WHEN ${a(1)} rlike '[^A-Za-z0-9]' THEN NULL " +
        s"ELSE hasTokenCaseInsensitive(${a(0)}, ${a(1)}) END)")
    q = rewriteCalls(q, "hasTokenOrNull")(a =>
      s"(CASE WHEN ${a(1)} rlike '[^A-Za-z0-9]' THEN NULL " +
        s"ELSE hasToken(${a(0)}, ${a(1)}) END)")
    // time_bucket/date_bin are toStartOfInterval spellings (canonicalized
    // here so the later toStartOfInterval template fires)
    q = rewriteCalls(q, "time_bucket")(a => s"toStartOfInterval(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "date_bin")(a => s"toStartOfInterval(${a(1)}, ${a(0)})")
    // norm*/distance* synonyms of the L*Norm/L*Distance family
    q = rewriteCalls(q, "normL2Squared")(a => s"L2SquaredNorm(${a(0)})")
    q = rewriteCalls(q, "normL1")(a => s"L1Norm(${a(0)})")
    q = rewriteCalls(q, "normL2")(a => s"L2Norm(${a(0)})")
    q = rewriteCalls(q, "normLinf")(a => s"LinfNorm(${a(0)})")
    q = rewriteCalls(q, "distanceL2Squared")(a => s"L2SquaredDistance(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "distanceL1")(a => s"L1Distance(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "distanceL2")(a => s"L2Distance(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "distanceLinf")(a => s"LinfDistance(${a(0)}, ${a(1)})")

    // ---- extended templates (round 2) ----
    // date/time
    for ((n, u) <- Seq("addHours" -> "HOUR", "addMinutes" -> "MINUTE",
        "addSeconds" -> "SECOND", "addMonths" -> "MONTH", "addYears" -> "YEAR",
        "addWeeks" -> "WEEK"))
      q = rewriteCalls(q, n)(a => s"(${a(0)} + INTERVAL ${a(1)} $u)")
    for ((n, u) <- Seq("subtractHours" -> "HOUR", "subtractMinutes" -> "MINUTE",
        "subtractSeconds" -> "SECOND", "subtractMonths" -> "MONTH",
        "subtractYears" -> "YEAR", "subtractWeeks" -> "WEEK"))
      q = rewriteCalls(q, n)(a => s"(${a(0)} - INTERVAL ${a(1)} $u)")
    q = rewriteCalls(q, "dateAdd")(a => s"(${a(2)} + INTERVAL ${a(1)} ${stripUnit(a(0))})")
    q = rewriteCalls(q, "dateSub")(a => s"(${a(2)} - INTERVAL ${a(1)} ${stripUnit(a(0))})")
    q = rewriteCalls(q, "toYYYYMM")(a => s"CAST(date_format(${a(0)}, 'yyyyMM') AS INT)")
    q = rewriteCalls(q, "toYYYYMMDD")(a => s"CAST(date_format(${a(0)}, 'yyyyMMdd') AS INT)")
    q = rewriteCalls(q, "yesterday")(_ => "(current_date() - 1)")
    q = rewriteCalls(q, "monthName")(a => s"date_format(${a(0)}, 'MMMM')")
    q = rewriteCalls(q, "toMonday")(a => s"CAST(date_trunc('week', ${a(0)}) AS DATE)")
    for ((n, secs) <- Seq("toStartOfFiveMinutes" -> 300L, "toStartOfTenMinutes" -> 600L,
        "toStartOfFifteenMinutes" -> 900L, "toStartOfMinute" -> 60L, "timeSlot" -> 1800L))
      q = rewriteCalls(q, n)(a =>
        s"timestamp_micros(unix_micros(${a(0)}) - pmod(unix_micros(${a(0)}), ${secs * 1000000L}))")
    q = rewriteCalls(q, "toStartOfInterval") { a =>
      // toStartOfInterval(ts, INTERVAL n unit) — epoch-aligned bucket
      val m = java.util.regex.Pattern.compile("(?i)INTERVAL\\s+(\\d+)\\s+(\\w+)").matcher(a(1))
      if (!m.find()) s"date_trunc('day', ${a(0)})"
      else {
        val n = m.group(1).toLong
        val micros = m.group(2).toUpperCase match {
          case "SECOND" | "SECONDS" => n * 1000000L
          case "MINUTE" | "MINUTES" => n * 60000000L
          case "HOUR" | "HOURS" => n * 3600000000L
          case "DAY" | "DAYS" => n * 86400000000L
          case _ => n * 1000000L
        }
        s"timestamp_micros(unix_micros(${a(0)}) - pmod(unix_micros(${a(0)}), ${micros}L))"
      }
    }
    q = rewriteCalls(q, "toRelativeDayNum")(a => s"datediff(${a(0)}, DATE '1970-01-01')")
    q = rewriteCalls(q, "toUnixTimestamp64Milli")(a => s"unix_millis(${a(0)})")
    // ---- round-10 batch 24: WindowView SQL spellings (reference
    // src/Functions/FunctionsTimeWindow.cpp: tumble/hop + Start/End +
    // windowID). Scalar semantics: the epoch-aligned window containing
    // the timestamp; hop uses the LATEST window whose start <= ts
    // (the streaming multi-assign expansion lives in
    // graft.streaming.Streams — these are the batch-SQL forms).
    def ivMicros(arg: String): String = {
      val m = java.util.regex.Pattern.compile("(?i)INTERVAL\\s+'?(\\d+)'?\\s+(\\w+)").matcher(arg)
      if (!m.find()) s"(CAST(${arg} AS BIGINT) * 1000000)" // plain seconds
      else {
        val n = m.group(1).toLong
        val micros = m.group(2).toUpperCase match {
          case "SECOND" | "SECONDS" => n * 1000000L
          case "MINUTE" | "MINUTES" => n * 60000000L
          case "HOUR" | "HOURS" => n * 3600000000L
          case "DAY" | "DAYS" => n * 86400000000L
          case "WEEK" | "WEEKS" => n * 604800000000L
          case _ => n * 1000000L
        }
        micros.toString + "L"
      }
    }
    def tumbleStartBody(t: String, iv: String): String = {
      val us = ivMicros(iv)
      s"timestamp_micros(unix_micros(CAST($t AS TIMESTAMP)) - " +
        s"pmod(unix_micros(CAST($t AS TIMESTAMP)), $us))"
    }
    q = rewriteCalls(q, "tumbleStart")(a =>
      if (a.length >= 2) tumbleStartBody(a(0), a(1)) else s"(${a(0)}.start)")
    q = rewriteCalls(q, "tumbleEnd")(a =>
      if (a.length >= 2)
        s"timestamp_micros(unix_micros(${tumbleStartBody(a(0), a(1))}) + ${ivMicros(a(1))})"
      else s"(${a(0)}.end)")
    q = rewriteCalls(q, "tumble")(a =>
      s"named_struct('start', ${tumbleStartBody(a(0), a(1))}, " +
        s"'end', timestamp_micros(unix_micros(${tumbleStartBody(a(0), a(1))}) + ${ivMicros(a(1))}))")
    def hopStartBody(t: String, slide: String): String = {
      val us = ivMicros(slide)
      s"timestamp_micros(unix_micros(CAST($t AS TIMESTAMP)) - " +
        s"pmod(unix_micros(CAST($t AS TIMESTAMP)), $us))"
    }
    q = rewriteCalls(q, "hopStart")(a =>
      if (a.length >= 3) hopStartBody(a(0), a(1)) else s"(${a(0)}.start)")
    q = rewriteCalls(q, "hopEnd")(a =>
      if (a.length >= 3)
        s"timestamp_micros(unix_micros(${hopStartBody(a(0), a(1))}) + ${ivMicros(a(2))})"
      else s"(${a(0)}.end)")
    q = rewriteCalls(q, "hop")(a =>
      s"named_struct('start', ${hopStartBody(a(0), a(1))}, " +
        s"'end', timestamp_micros(unix_micros(${hopStartBody(a(0), a(1))}) + ${ivMicros(a(2))}))")
    // windowID: the reference returns a deterministic id of the window —
    // the window-end epoch seconds plays that role (unique per window)
    q = rewriteCalls(q, "windowID")(a =>
      if (a.length >= 3)
        s"CAST((unix_micros(${hopStartBody(a(0), a(1))}) + ${ivMicros(a(2))}) / 1000000 AS BIGINT)"
      else if (a.length == 2)
        s"CAST((unix_micros(${tumbleStartBody(a(0), a(1))}) + ${ivMicros(a(1))}) / 1000000 AS BIGINT)"
      else s"CAST(unix_micros(${a(0)}.end) / 1000000 AS BIGINT)")
    val bestEffort = (s: String) =>
      s"coalesce(try_to_timestamp($s, 'yyyy-MM-dd HH:mm:ss'), " +
        s"try_to_timestamp($s, \"yyyy-MM-dd'T'HH:mm:ss\"), " +
        s"try_to_timestamp($s, 'dd/MM/yyyy HH:mm:ss'), " +
        s"try_to_timestamp($s, 'dd/MM/yyyy'), try_to_timestamp($s, 'yyyy-MM-dd'))"
    q = rewriteCalls(q, "parseDateTimeBestEffortOrNull")(a => bestEffort(a(0)))
    q = rewriteCalls(q, "parseDateTimeBestEffort")(a => bestEffort(a(0)))
    // round-10 batch 24: the US spellings prefer MM/DD over DD/MM
    // (reference parseDateTimeBestEffortUS — parseDateTimeBestEffort.cpp
    // is_us_style); the 64 spellings land on microsecond TIMESTAMP
    val bestEffortUS = (s: String) =>
      s"coalesce(try_to_timestamp($s, 'yyyy-MM-dd HH:mm:ss'), " +
        s"try_to_timestamp($s, \"yyyy-MM-dd'T'HH:mm:ss\"), " +
        s"try_to_timestamp($s, 'MM/dd/yyyy HH:mm:ss'), " +
        s"try_to_timestamp($s, 'MM/dd/yyyy'), try_to_timestamp($s, 'yyyy-MM-dd'))"
    val epochTs = "TIMESTAMP'1970-01-01 00:00:00'"
    for (n <- Seq("parseDateTimeBestEffortUSOrNull", "parseDateTime64BestEffortUSOrNull"))
      q = rewriteCalls(q, n)(a => bestEffortUS(a(0)))
    for (n <- Seq("parseDateTimeBestEffortUSOrZero", "parseDateTime64BestEffortUSOrZero"))
      q = rewriteCalls(q, n)(a => s"coalesce(${bestEffortUS(a(0))}, $epochTs)")
    for (n <- Seq("parseDateTimeBestEffortUS", "parseDateTime64BestEffortUS"))
      q = rewriteCalls(q, n)(a => bestEffortUS(a(0)))
    // Joda-syntax Or* spellings (Spark's own datetime patterns ARE the
    // Joda-style tokens — parseDateTimeInJodaSyntax below maps 1:1)
    for (n <- Seq("parseDateTimeInJodaSyntaxOrNull", "parseDateTime64InJodaSyntaxOrNull"))
      q = rewriteCalls(q, n)(a =>
        if (a.length >= 2) s"try_to_timestamp(${a(0)}, ${a(1)})"
        else s"try_to_timestamp(${a(0)})")
    for (n <- Seq("parseDateTimeInJodaSyntaxOrZero", "parseDateTime64InJodaSyntaxOrZero"))
      q = rewriteCalls(q, n)(a =>
        if (a.length >= 2) s"coalesce(try_to_timestamp(${a(0)}, ${a(1)}), $epochTs)"
        else s"coalesce(try_to_timestamp(${a(0)}), $epochTs)")
    q = rewriteCalls(q, "parseDateTime64InJodaSyntax")(a =>
      if (a.length >= 2) s"to_timestamp(${a(0)}, ${a(1)})" else s"to_timestamp(${a(0)})")
    q = rewriteCalls(q, "toDateTimeOrNull")(a => s"try_cast(${a(0)} AS TIMESTAMP)")
    // toInterval(n, 'unit') — the generic spelling dispatches on the
    // quoted unit (reference FunctionsConversion.h toIntervalT family)
    q = rewriteCalls(q, "toInterval") { a =>
      val n = a(0)
      a(1).replaceAll("'", "").trim.toLowerCase match {
        case "second" => s"make_interval(0, 0, 0, 0, 0, 0, $n)"
        case "minute" => s"make_interval(0, 0, 0, 0, 0, $n)"
        case "hour" => s"make_interval(0, 0, 0, 0, $n)"
        case "day" => s"make_interval(0, 0, 0, $n)"
        case "week" => s"make_interval(0, 0, $n)"
        case "month" => s"make_interval(0, $n)"
        case "quarter" => s"make_interval(0, 3 * ($n))"
        case "year" => s"make_interval($n)"
        case other => s"raise_error('toInterval: unsupported unit $other')"
      }
    }
    // string
    q = rewriteCalls(q, "appendTrailingCharIfAbsent")(a =>
      s"(CASE WHEN endswith(${a(0)}, ${a(1)}) THEN ${a(0)} ELSE concat(${a(0)}, ${a(1)}) END)")
    q = rewriteCalls(q, "tokens")(a => s"split(${a(0)}, '[^A-Za-z0-9]+')")
    q = rewriteCalls(q, "alphaTokens")(a => s"split(${a(0)}, '[^A-Za-z]+')")
    q = rewriteCalls(q, "splitByWhitespace")(a => s"split(${a(0)}, '\\\\s+')")
    q = rewriteCalls(q, "splitByString")(a =>
      s"split(${a(1)}, concat('\\\\Q', ${a(0)}, '\\\\E'))")
    q = rewriteCalls(q, "extractAll")(a => s"regexp_extract_all(${a(0)}, ${a(1)}, 0)")
    q = rewriteCalls(q, "firstLine")(a => s"element_at(split(${a(0)}, '\\\\n'), 1)")
    val ngramParts = (x: String) => s"char_ngram_hashes($x, 4)"
    q = rewriteCalls(q, "ngramDistance")(a =>
      s"(CAST(1 AS DOUBLE) - (CAST(2 AS DOUBLE) * intersect_count_sorted_longs(${ngramParts(a(0))}, ${ngramParts(a(1))})) " +
        s"/ (size(${ngramParts(a(0))}) + size(${ngramParts(a(1))})))")
    q = rewriteCalls(q, "ngramSearch")(a =>
      s"(CAST(intersect_count_sorted_longs(${ngramParts(a(0))}, ${ngramParts(a(1))}) AS DOUBLE) " +
        s"/ size(${ngramParts(a(1))}))")
    q = rewriteCalls(q, "multiSearchAnyCaseInsensitive")(a =>
      s"exists(${a(1)}, __n -> instr(lower(${a(0)}), lower(__n)) > 0)")
    q = rewriteCalls(q, "multiSearchFirstPosition")(a =>
      s"coalesce(array_min(filter(transform(${a(1)}, __n -> instr(${a(0)}, __n)), __p -> __p > 0)), 0)")
    q = rewriteCalls(q, "multiSearchFirstIndex")(a =>
      s"coalesce(array_position(transform(${a(1)}, __n -> instr(${a(0)}, __n)), " +
        s"array_min(filter(transform(${a(1)}, __n -> instr(${a(0)}, __n)), __p -> __p > 0))), 0)")
    q = rewriteCalls(q, "multiSearchAny")(a =>
      s"exists(${a(1)}, __n -> instr(${a(0)}, __n) > 0)")
    // multiMatchAny: any of several REGEX patterns matches (reference
    // multiMatchAny.cpp — hyperscan there; per-pattern rlike here).
    q = rewriteCalls(q, "multiMatchAny")(a =>
      s"exists(${a(1)}, __p -> ${a(0)} RLIKE __p)")
    q = rewriteCalls(q, "multiMatchAnyIndex")(a =>
      s"coalesce(array_position(transform(${a(1)}, __p -> ${a(0)} RLIKE __p), true), 0)")
    // ---- round-10 batch 20: search-family tail ----
    // CaseInsensitive spellings of the position/index searches: lower
    // both sides (byte-fold is ASCII-only in the reference — identical)
    q = rewriteCalls(q, "multiSearchFirstPositionCaseInsensitive")(a =>
      s"coalesce(array_min(filter(transform(${a(1)}, " +
        s"__n -> instr(lower(${a(0)}), lower(__n))), __p -> __p > 0)), 0)")
    q = rewriteCalls(q, "multiSearchFirstIndexCaseInsensitive")(a =>
      s"coalesce(array_position(transform(${a(1)}, __n -> instr(lower(${a(0)}), lower(__n))), " +
        s"array_min(filter(transform(${a(1)}, __n -> instr(lower(${a(0)}), lower(__n))), " +
        s"__p -> __p > 0))), 0)")
    q = rewriteCalls(q, "ngramDistanceCaseInsensitive")(a =>
      s"(CAST(1 AS DOUBLE) - (CAST(2 AS DOUBLE) * " +
        s"intersect_count_sorted_longs(${ngramParts(s"lower(${a(0)})")}, ${ngramParts(s"lower(${a(1)})")})) " +
        s"/ (size(${ngramParts(s"lower(${a(0)})")}) + size(${ngramParts(s"lower(${a(1)})")})))")
    q = rewriteCalls(q, "ngramSearchCaseInsensitive")(a =>
      s"(CAST(intersect_count_sorted_longs(${ngramParts(s"lower(${a(0)})")}, " +
        s"${ngramParts(s"lower(${a(1)})")}) AS DOUBLE) / size(${ngramParts(s"lower(${a(1)})")}))")
    // multiMatchAllIndices (multiMatchAllIndices.cpp): 1-based indices of
    // every matching pattern, in pattern order
    q = rewriteCalls(q, "multiMatchAllIndices")(a =>
      s"filter(transform(${a(1)}, (__p, __i) -> " +
        s"CASE WHEN ${a(0)} RLIKE __p THEN CAST(__i + 1 AS BIGINT) END), " +
        s"__x -> __x IS NOT NULL)")
    // multiFuzzyMatch* (MultiMatchAnyImpl.h — hyperscan edit-distance
    // matching there; LITERAL patterns only here via the Sellers kernel,
    // regex metacharacters rejected at eval): (haystack, distance, [p...])
    q = rewriteCalls(q, "multiFuzzyMatchAny")(a =>
      s"exists(${a(2)}, __p -> fuzzy_substr_dist(${a(0)}, __p) <= ${a(1)})")
    q = rewriteCalls(q, "multiFuzzyMatchAnyIndex")(a =>
      s"coalesce(array_position(transform(${a(2)}, " +
        s"__p -> fuzzy_substr_dist(${a(0)}, __p) <= ${a(1)}), true), 0)")
    q = rewriteCalls(q, "multiFuzzyMatchAllIndices")(a =>
      s"filter(transform(${a(2)}, (__p, __i) -> " +
        s"CASE WHEN fuzzy_substr_dist(${a(0)}, __p) <= ${a(1)} " +
        s"THEN CAST(__i + 1 AS BIGINT) END), __x -> __x IS NOT NULL)")
    // compareSubstrings(s1, s2, off1, off2, n): zero-based offsets,
    // bytewise memcmp clipped to the available bytes (compareSubstrings.cpp)
    q = rewriteCalls(q, "compareSubstrings")(a =>
      s"compare_substrings(${a(0)}, ${a(1)}, ${a(2)}, ${a(3)}, ${a(4)})")
    q = rewriteCalls(q, "decodeHTMLComponent")(a =>
      s"decode_html_component(${a(0)})")
    q = rewriteCalls(q, "stringJaccardIndexUTF8")(a =>
      s"string_jaccard_chars(${a(0)}, ${a(1)})")
    // byteSlice = the byte-based substring (byteSlice.cpp shares
    // GatherUtils sliceFromLeft/Right with substring's byte branch)
    q = rewriteCalls(q, "byteSlice")(a => byteSubstr(a))
    q = rewriteCalls(q, "bitSlice")(a =>
      s"bit_slice(${a.mkString(", ")})")
    q = rewriteCalls(q, "bin")(a => s"ch_bin(${a(0)})")
    q = rewriteCalls(q, "unbin")(a => s"ch_unbin(${a(0)})")
    // CH encrypt('mode', plain, key[, iv]) -> Spark aes_encrypt(plain,
    // key, MODE). CH mode strings like 'aes-128-ecb'.
    val aesMode = (m: String) => {
      val lower = m.replaceAll("'", "").toLowerCase
      if (lower.endsWith("gcm")) "'GCM'" else if (lower.endsWith("cbc")) "'CBC'" else "'ECB'"
    }
    q = rewriteCalls(q, "encrypt")(a => s"aes_encrypt(${a(1)}, ${a(2)}, ${aesMode(a(0))})")
    q = rewriteCalls(q, "tryDecrypt")(a =>
      s"try_aes_decrypt(${a(1)}, ${a(2)}, ${aesMode(a(0))})")
    q = rewriteCalls(q, "decrypt")(a => s"aes_decrypt(${a(1)}, ${a(2)}, ${aesMode(a(0))})")
    q = rewriteCalls(q, "hasTokenCaseInsensitive")(a =>
      s"(lower(${a(0)}) RLIKE concat('(^|[^a-z0-9])', lower(${a(1)}), '([^a-z0-9]|$$)'))")
    q = rewriteCalls(q, "hasToken")(a =>
      s"(${a(0)} RLIKE concat('(^|[^A-Za-z0-9])', ${a(1)}, '([^A-Za-z0-9]|$$)'))")
    // hash
    for ((n, bits) <- Seq("SHA224" -> 224, "SHA256" -> 256, "SHA384" -> 384, "SHA512" -> 512))
      q = rewriteCalls(q, n)(a => s"sha2(${a(0)}, $bits)")
    // URL
    q = rewriteCalls(q, "protocol")(a => s"lower(parse_url(${a(0)}, 'PROTOCOL'))")
    q = rewriteCalls(q, "domainWithoutWWW")(a =>
      s"regexp_replace(parse_url(${a(0)}, 'HOST'), '^www\\\\.', '')")
    q = rewriteCalls(q, "domain")(a => s"parse_url(${a(0)}, 'HOST')")
    q = rewriteCalls(q, "topLevelDomain")(a =>
      s"regexp_extract(parse_url(${a(0)}, 'HOST'), '\\\\.([^.]+)$$', 1)")
    q = rewriteCalls(q, "pathOnly")(a => s"parse_url(${a(0)}, 'PATH')")
    q = rewriteCalls(q, "queryString")(a => s"parse_url(${a(0)}, 'QUERY')")
    q = rewriteCalls(q, "fragment")(a => s"parse_url(${a(0)}, 'REF')")
    q = rewriteCalls(q, "extractURLParameter")(a => s"parse_url(${a(0)}, 'QUERY', ${a(1)})")
    q = rewriteCalls(q, "cutQueryString")(a => s"regexp_replace(${a(0)}, '\\\\?.*$$', '')")
    // JSON — missing key / wrong type yields the RESULT-TYPE DEFAULT
    // (0, 0.0, false, ''), not NULL: reference FunctionsJSON.cpp:167
    // "We add default value (=null or zero) if something goes wrong, we
    // don't throw exceptions in these JSON functions." A NULL json
    // argument still propagates NULL.
    // try_cast everywhere: a wrong-typed element must yield the default,
    // not an ANSI cast error (CH never throws from JSON functions)
    q = rewriteCalls(q, "JSONExtractInt")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(try_cast(get_json_object(${a(0)}, ${jsonPath(a)}) AS BIGINT), 0) END)")
    q = rewriteCalls(q, "JSONExtractFloat")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(try_cast(get_json_object(${a(0)}, ${jsonPath(a)}) AS DOUBLE), CAST(0 AS DOUBLE)) END)")
    q = rewriteCalls(q, "JSONExtractBool")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(try_cast(get_json_object(${a(0)}, ${jsonPath(a)}) AS BOOLEAN), false) END)")
    q = rewriteCalls(q, "JSONExtractString")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(get_json_object(${a(0)}, ${jsonPath(a)}), '') END)")
    q = rewriteCalls(q, "JSONHas")(a =>
      s"(get_json_object(${a(0)}, ${jsonPath(a)}) IS NOT NULL)")
    q = rewriteCalls(q, "isValidJSON")(a =>
      s"(get_json_object(${a(0)}, '$$') IS NOT NULL)")
    // arrays
    // greatest(..., 0): Spark slice ERRORS on negative length, CH pops
    // of an empty array return []
    q = rewriteCalls(q, "arrayPopBack")(a =>
      s"slice(${a(0)}, 1, greatest(size(${a(0)}) - 1, 0))")
    q = rewriteCalls(q, "arrayPopFront")(a =>
      s"slice(${a(0)}, 2, greatest(size(${a(0)}) - 1, 0))")
    q = rewriteCalls(q, "hasAll")(a => s"(size(array_except(${a(1)}, ${a(0)})) = 0)")
    q = rewriteCalls(q, "arrayFirstIndex")(a =>
      s"coalesce(array_position(transform(${a(1)}, ${a(0)}), true), 0)")
    // no-match yields the ELEMENT-TYPE DEFAULT (0/''/[]), not NULL —
    // reference arrayFirstLast.cpp:187,195 (only the OrNull variants
    // return NULL); ch_first/last_default dispatch on the element type
    q = rewriteCalls(q, "arrayFirst")(a => s"ch_first_default(filter(${a(1)}, ${a(0)}))")
    q = rewriteCalls(q, "arrayLast")(a => s"ch_last_default(filter(${a(1)}, ${a(0)}))")
    // empty array -> 0 (reference arrayAggregation.cpp avg of none);
    // CASE guards the division so ANSI mode doesn't throw on size 0
    q = rewriteCalls(q, "arrayAvg")(a =>
      s"(CASE WHEN size(${a(0)}) = 0 THEN CAST(0 AS DOUBLE) " +
        s"ELSE aggregate(${a(0)}, CAST(0 AS DOUBLE), (__a, __x) -> __a + __x)" +
        s" / size(${a(0)}) END)")
    // empty array -> 0, matching the reference's observable output
    // (arrayAggregation.cpp product over no elements)
    q = rewriteCalls(q, "arrayProduct")(a =>
      s"(CASE WHEN size(${a(0)}) = 0 THEN CAST(0 AS DOUBLE) " +
        s"ELSE aggregate(${a(0)}, CAST(1 AS DOUBLE), (__a, __x) -> __a * __x) END)")
    // count must be INT for Spark's array_repeat (a UInt64-typed
    // `rand() % 10 + 5` arrives as BIGINT — column_array_replicate.xml);
    // a negative or absurd size raises TOO_LARGE_ARRAY_SIZE like the
    // reference (arrayWithConstant.cpp caps at 1e9 elements; 00842 pins
    // the negative case) — Spark's array_repeat would silently return []
    q = rewriteCalls(q, "arrayWithConstant") { a =>
      val n = s"CAST(${a(0)} AS BIGINT)"
      s"array_repeat(${a(1)}, CAST(CASE WHEN $n < 0 OR $n > 1000000000 " +
        s"THEN CAST(raise_error(concat('TOO_LARGE_ARRAY_SIZE: Array size ', " +
        s"CAST($n AS STRING), ' is negative or too large: " +
        s"while executing function arrayWithConstant')) AS BIGINT) " +
        s"ELSE $n END AS INT))"
    }
    // sequence(1, 0) would DESCEND on empty arrays — build [0..size] and
    // drop the leading 0 instead (slice of an ascending sequence)
    q = rewriteCalls(q, "arrayEnumerate")(a =>
      s"slice(sequence(0, size(${a(0)})), 2, size(${a(0)}))")
    q = rewriteCalls(q, "arrayReverseSort")(a =>
      if (a.length == 1) s"reverse(array_sort(${a(0)}))"
      else s"reverse(array_sort(transform(${a(1)}, ${a(0)})))")
    q = rewriteCalls(q, "countEqual")(a => s"size(filter(${a(0)}, __x -> __x <=> ${a(1)}))")
    q = rewriteCalls(q, "groupArrayArray")(a => s"flatten(collect_list(${a(0)}))")
    // math
    q = rewriteCalls(q, "sqr")(a => s"((${a(0)}) * (${a(0)}))")
    q = rewriteCalls(q, "sigmoid")(a => s"(1.0 / (1.0 + exp(-(${a(0)}))))")
    q = rewriteCalls(q, "exp2")(a => s"pow(2.0, ${a(0)})")
    q = rewriteCalls(q, "exp10")(a => s"pow(10.0, ${a(0)})")
    q = rewriteCalls(q, "intExp2")(a => s"shiftleft(CAST(1 AS BIGINT), ${a(0)})")
    q = rewriteCalls(q, "intExp10")(a => s"CAST(round(pow(10.0, ${a(0)})) AS BIGINT)")
    q = rewriteCalls(q, "roundToExp2")(a => s"pow(2.0, floor(log2(${a(0)})))")
    q = rewriteCalls(q, "isFinite")(a =>
      s"(NOT isnan(CAST(${a(0)} AS DOUBLE)) AND abs(CAST(${a(0)} AS DOUBLE)) != CAST('Infinity' AS DOUBLE))")
    q = rewriteCalls(q, "isInfinite")(a => s"(abs(CAST(${a(0)} AS DOUBLE)) = CAST('Infinity' AS DOUBLE))")
    // bits
    q = rewriteCalls(q, "bitAnd")(a => s"((${a(0)}) & (${a(1)}))")
    q = rewriteCalls(q, "bitOr")(a => s"((${a(0)}) | (${a(1)}))")
    q = rewriteCalls(q, "bitXor")(a => s"((${a(0)}) ^ (${a(1)}))")
    q = rewriteCalls(q, "bitNot")(a => s"(~(${a(0)}))")
    q = rewriteCalls(q, "bitTest")(a => s"((shiftright(${a(0)}, ${a(1)})) & 1)")
    // null / comparison
    q = rewriteCalls(q, "isNotDistinctFrom")(a => s"((${a(0)}) <=> (${a(1)}))")
    q = rewriteCalls(q, "isDistinctFrom")(a => s"(NOT ((${a(0)}) <=> (${a(1)})))")
    q = rewriteCalls(q, "ifNotFinite")(a =>
      s"(CASE WHEN isnan(CAST(${a(0)} AS DOUBLE)) OR abs(CAST(${a(0)} AS DOUBLE)) = CAST('Infinity' AS DOUBLE) THEN ${a(1)} ELSE ${a(0)} END)")
    // the CASE keeps the VALUE but flips the Spark nullability bit —
    // CH Nullable(T) semantics (empty-set aggregates over toNullable
    // yield NULL, 00572); the always-true branch folds away post-analysis
    q = rewriteCalls(q, "toNullable")(a =>
      s"(CASE WHEN 1 = 1 THEN (${a(0)}) END)")
    q = rewriteCalls(q, "materialize")(a => s"(${a(0)})")
    q = rewriteCalls(q, "identity")(a => s"(${a(0)})")
    // type conversion
    q = rewriteCalls(q, "toInt8")(a => s"CAST(${a(0)} AS TINYINT)")
    q = rewriteCalls(q, "toInt16")(a => s"CAST(${a(0)} AS SMALLINT)")
    // CH unsigned casts WRAP on overflow; pmod reproduces that for
    // non-negative widths (toUInt64 can only map to BIGINT — documented).
    q = rewriteCalls(q, "toUInt8")(a => s"pmod(CAST(${a(0)} AS BIGINT), 256)")
    q = rewriteCalls(q, "toUInt16")(a => s"pmod(CAST(${a(0)} AS BIGINT), 65536)")
    q = rewriteCalls(q, "toUInt32")(a => s"pmod(CAST(${a(0)} AS BIGINT), 4294967296)")
    q = rewriteCalls(q, "toUInt64")(a => s"CAST(${a(0)} AS BIGINT)")
    q = rewriteCalls(q, "toFloat32")(a => s"CAST(${a(0)} AS FLOAT)")
    // upgraded in round 10 to the same strict CH grammar + saturation as
    // the OrZero/OrDefault spellings (was a bare try_cast)
    q = rewriteCalls(q, "toDateOrNull")(a =>
      s"(CASE WHEN CAST(${a(0)} AS STRING) RLIKE '^[0-9]{4}-[0-9]{2}-[0-9]{2}$$' THEN " +
        s"least(greatest(try_cast(CAST(${a(0)} AS STRING) AS DATE), " +
        s"DATE'1970-01-01'), DATE'2149-06-06') END)")
    // random (CH rand() is UInt32; emit RAND() uppercase so the rand
    // template below never touches expansions from these)
    q = rewriteCalls(q, "randCanonical")(_ => "RAND()")
    q = rewriteCalls(q, "randUniform")(a => s"(${a(0)} + RAND() * ((${a(1)}) - (${a(0)})))")
    q = rewriteCalls(q, "randNormal")(a => s"(${a(0)} + RANDN() * (${a(1)}))")
    // randDistribution tail (reference src/Functions/randDistribution.cpp:352-457).
    // Exact transforms where a closed form exists (inverse-CDF exponential/
    // geometric, Box-Muller normals via RANDN, counting folds for the
    // discrete families — RAND() re-evaluates per lambda element, verified);
    // chi-squared is the exact sum of dof squared normals for integer dof
    // and the published Wilson-Hilferty cube approximation for fractional.
    def chi2Sql(k: String): String =
      s"(CASE WHEN ($k) >= 1 AND ($k) = FLOOR($k) THEN " +
        s"aggregate(sequence(1, CAST($k AS INT)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + POW(RANDN(), 2)) " +
        s"ELSE GREATEST(0.0, ($k) * POW(1.0 - 2.0/(9.0*($k)) + RANDN() * SQRT(2.0/(9.0*($k))), 3)) END)"
    q = rewriteCalls(q, "randExponential")(a => s"(-LN(1.0 - RAND()) / (${a(0)}))")
    q = rewriteCalls(q, "randLogNormal")(a => s"EXP((${a(0)}) + RANDN() * (${a(1)}))")
    q = rewriteCalls(q, "randChiSquared")(a => chi2Sql(a(0)))
    q = rewriteCalls(q, "randStudentT")(a =>
      s"(RANDN() / SQRT(${chi2Sql(a(0))} / (${a(0)})))")
    q = rewriteCalls(q, "randFisherF")(a =>
      s"((${chi2Sql(a(0))} / (${a(0)})) / (${chi2Sql(a(1))} / (${a(1)})))")
    q = rewriteCalls(q, "randBernoulli")(a => s"CAST(IF(RAND() < (${a(0)}), 1, 0) AS BIGINT)")
    q = rewriteCalls(q, "randBinomial")(a =>
      s"(CASE WHEN CAST(${a(0)} AS INT) < 1 THEN 0L ELSE aggregate(sequence(1, CAST(${a(0)} AS INT)), 0L, " +
        s"(acc, x) -> acc + IF(RAND() < (${a(1)}), 1L, 0L)) END)")
    q = rewriteCalls(q, "randNegativeBinomial")(a =>
      s"(CASE WHEN CAST(${a(0)} AS INT) < 1 THEN 0L ELSE aggregate(sequence(1, CAST(${a(0)} AS INT)), 0L, " +
        s"(acc, x) -> acc + CAST(FLOOR(LN(1.0 - RAND()) / LN(1.0 - (${a(1)}))) AS BIGINT)) END)")
    q = rewriteCalls(q, "randPoisson")(a =>
      s"(CASE WHEN CAST(${a(0)} AS INT) < 1 THEN 0L ELSE aggregate(sequence(1, CAST(${a(0)} AS INT)), 0L, " +
        s"(acc, i) -> acc + (aggregate(sequence(1, 17), named_struct('p', CAST(1.0 AS DOUBLE), 'c', 0L), " +
        s"(st, x) -> named_struct('p', st.p * RAND(), 'c', st.c + IF(st.p > EXP(-1.0), 1L, 0L)), " +
        s"st -> st.c) - 1L)) END)")
    q = rewriteCalls(q, "rand64")(_ => "CAST(RAND() * 9.223372036854775e18 AS BIGINT)")
    q = rewriteCalls(q, "rand")(_ => "CAST(RAND() * 4294967296 AS BIGINT)")
    // IP
    q = rewriteCalls(q, "IPv4NumToString")(a =>
      s"concat_ws('.', CAST((shiftright(${a(0)}, 24)) & 255 AS STRING), " +
        s"CAST((shiftright(${a(0)}, 16)) & 255 AS STRING), " +
        s"CAST((shiftright(${a(0)}, 8)) & 255 AS STRING), CAST(${a(0)} & 255 AS STRING))")
    q = rewriteCalls(q, "IPv4StringToNum")(a =>
      s"(CAST(element_at(split(${a(0)}, '\\\\.'), 1) AS BIGINT) * 16777216 + " +
        s"CAST(element_at(split(${a(0)}, '\\\\.'), 2) AS BIGINT) * 65536 + " +
        s"CAST(element_at(split(${a(0)}, '\\\\.'), 3) AS BIGINT) * 256 + " +
        s"CAST(element_at(split(${a(0)}, '\\\\.'), 4) AS BIGINT))")
    q = rewriteCalls(q, "isIPv4String")(a =>
      s"(${a(0)} RLIKE '^([0-9]{1,3}\\\\.){3}[0-9]{1,3}$$')")
    q = rewriteCalls(q, "isIPv6String")(a => s"(ipv6_string_to_num(${a(0)}) IS NOT NULL)")
    q = rewriteCalls(q, "stem")(a =>
      if (a.length == 2) s"porter_stem(${a(1)})" else s"porter_stem(${a(0)})")
    // ---- batch 3 templates ----
    q = rewriteCalls(q, "toStartOfSecond")(a => s"date_trunc('second', ${a(0)})")
    q = rewriteCalls(q, "age") { a =>
      // age() = ELAPSED full units (bare timestampdiff, no truncation);
      // sub-second units via unix_micros — Spark's timestampdiff stops
      // at SECOND
      stripUnit(a(0)) match {
        case "MILLISECOND" =>
          s"((unix_micros(CAST(${a(2)} AS TIMESTAMP)) - " +
            s"unix_micros(CAST(${a(1)} AS TIMESTAMP))) DIV 1000)"
        case "MICROSECOND" =>
          s"(unix_micros(CAST(${a(2)} AS TIMESTAMP)) - " +
            s"unix_micros(CAST(${a(1)} AS TIMESTAMP)))"
        case "NANOSECOND" | "NS" =>
          s"((unix_micros(CAST(${a(2)} AS TIMESTAMP)) - " +
            s"unix_micros(CAST(${a(1)} AS TIMESTAMP))) * 1000)"
        case u => s"timestampdiff($u, ${a(1)}, ${a(2)})"
      }
    }
    q = rewriteCalls(q, "timeDiff")(a => s"(unix_timestamp(${a(1)}) - unix_timestamp(${a(0)}))")
    q = rewriteCalls(q, "timezone")(_ => "'UTC'") // session zone is pinned UTC
    q = rewriteCalls(q, "serverTimezone")(_ => "'UTC'")
    q = rewriteCalls(q, "fromUnixTimestamp64Nano")(a => s"timestamp_micros((${a(0)}) div 1000)")
    q = rewriteCalls(q, "toUnixTimestamp64Nano")(a => s"(unix_micros(${a(0)}) * 1000)")
    q = rewriteCalls(q, "dateName") { a =>
      val fmt = a(0).replaceAll("'", "").toLowerCase match {
        case "year" => "yyyy"
        case "month" => "MMMM"
        case "weekday" => "EEEE"
        case "quarter" => "QQQ"
        case _ => "yyyy-MM-dd"
      }
      s"date_format(${a(1)}, '$fmt')"
    }
    q = rewriteCalls(q, "countSubstringsCaseInsensitive")(a =>
      s"regexp_count(lower(${a(0)}), lower(${a(1)}))")
    q = rewriteCalls(q, "notLike")(a => s"(NOT (${a(0)} LIKE ${a(1)}))")
    q = rewriteCalls(q, "notILike")(a => s"(NOT (${a(0)} ILIKE ${a(1)}))")
    q = rewriteCalls(q, "zeroIfNull")(a => s"coalesce(${a(0)}, 0)")
    q = rewriteCalls(q, "nullIfZero")(a => s"nullif(${a(0)}, 0)")
    q = rewriteCalls(q, "intDivOrZero")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN 0 ELSE (${a(0)}) div (${a(1)}) END)")
    q = rewriteCalls(q, "moduloOrZero")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN 0 ELSE (${a(0)}) % (${a(1)}) END)")
    q = rewriteCalls(q, "negate")(a => s"ch_negate(${a(0)})")
    q = rewriteCalls(q, "toDecimal32")(a =>
      s"CAST(${a(0)} AS DECIMAL(9, ${clampScale(a(1), 9)}))")
    q = rewriteCalls(q, "toDecimal64")(a =>
      s"CAST(${a(0)} AS DECIMAL(18, ${clampScale(a(1), 18)}))")
    q = rewriteCalls(q, "toDecimal128")(a =>
      s"CAST(${a(0)} AS DECIMAL(38, ${clampScale(a(1), 38)}))")
    // (CH transform(x, from, to[, default]) is handled up in
    // rewriteAggSpellings — first-match zip_with scan, subquery-arg
    // map_from_arrays fallback; Spark's 2-arg HOF passes through)
    q = rewriteCalls(q, "arrayResize")(a =>
      if (a.length == 3)
        s"(CASE WHEN size(${a(0)}) >= ${a(1)} THEN slice(${a(0)}, 1, ${a(1)}) " +
          s"ELSE concat(${a(0)}, array_repeat(${a(2)}, (${a(1)}) - size(${a(0)}))) END)"
      else
        // 2-arg form must also EXTEND (CH pads with the type default; we
        // pad with NULL via try_element_at — truncate-only would be wrong).
        // sequence(1, 0) would descend on n=0 — ascending slice instead.
        s"transform(slice(sequence(0, ${a(1)}), 2, ${a(1)}), " +
          s"__i -> try_element_at(${a(0)}, __i))")
    q = rewriteCalls(q, "bitTestAll")(a =>
      a.drop(1).map(b => s"((shiftright(${a(0)}, $b) & 1) = 1)").mkString("(", " AND ", ")"))
    q = rewriteCalls(q, "bitTestAny")(a =>
      a.drop(1).map(b => s"((shiftright(${a(0)}, $b) & 1) = 1)").mkString("(", " OR ", ")"))
    // ---- batch 4 templates ----
    // CH char(c1, c2, …) builds a string from code points; Spark char is 1-arg
    q = rewriteCalls(q, "char")(a =>
      if (a.length == 1) s"char(${a(0)})"
      else a.map(x => s"char($x)").mkString("concat(", ", ", ")"))
    // CH map HOFs take the lambda first (like the array family)
    q = rewriteCalls(q, "mapFilter")(a => s"map_filter(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "mapExists")(a => s"(cardinality(map_filter(${a(1)}, ${a(0)})) > 0)")
    // mapAdd/mapSubtract merge by key, missing keys count as 0
    q = rewriteCalls(q, "mapAdd")(a =>
      s"map_zip_with(${a(0)}, ${a(1)}, (__k, __a, __b) -> coalesce(__a, 0) + coalesce(__b, 0))")
    q = rewriteCalls(q, "mapSubtract")(a =>
      s"map_zip_with(${a(0)}, ${a(1)}, (__k, __a, __b) -> coalesce(__a, 0) - coalesce(__b, 0))")
    q = rewriteCalls(q, "clamp")(a => s"least(greatest(${a(0)}, ${a(1)}), ${a(2)})")
    // normalizeQuery now resolves via the plain alias to the injected
    // normalize_query kernel (literal erasure + IN-list collapse) — the
    // old inline regexp template lacked the '?..' list collapse
    q = rewriteCalls(q, "addQuarters")(a => s"(${a(0)} + make_interval(0, 3 * (${a(1)})))")
    q = rewriteCalls(q, "subtractQuarters")(a => s"(${a(0)} - make_interval(0, 3 * (${a(1)})))")
    q = rewriteCalls(q, "addMilliseconds")(a =>
      s"timestamp_micros(unix_micros(${a(0)}) + (${a(1)}) * 1000)")
    q = rewriteCalls(q, "subtractMilliseconds")(a =>
      s"timestamp_micros(unix_micros(${a(0)}) - (${a(1)}) * 1000)")
    q = rewriteCalls(q, "toRelativeHourNum")(a => s"(unix_timestamp(${a(0)}) div 3600)")
    q = rewriteCalls(q, "toRelativeMinuteNum")(a => s"(unix_timestamp(${a(0)}) div 60)")
    q = rewriteCalls(q, "toRelativeSecondNum")(a => s"unix_timestamp(${a(0)})")
    // toTime: keep time-of-day, move the date to 1970-01-02 (reference doc)
    q = rewriteCalls(q, "toTime")(a =>
      s"timestamp_micros(86400000000 + pmod(unix_micros(${a(0)}), 86400000000))")
    for ((n, tpl) <- Seq(
        "toIntervalYear" -> "make_interval(%s)",
        "toIntervalQuarter" -> "make_interval(0, 3 * (%s))",
        "toIntervalMonth" -> "make_interval(0, %s)",
        "toIntervalWeek" -> "make_interval(0, 0, %s)",
        "toIntervalDay" -> "make_interval(0, 0, 0, %s)",
        "toIntervalHour" -> "make_interval(0, 0, 0, 0, %s)",
        "toIntervalMinute" -> "make_interval(0, 0, 0, 0, 0, %s)",
        "toIntervalSecond" -> "make_interval(0, 0, 0, 0, 0, 0, %s)"))
      q = rewriteCalls(q, n)(a => tpl.format(a(0)))
    // 64-bit rotates (CH rotates at argument width; BIGINT here)
    q = rewriteCalls(q, "bitRotateLeft")(a =>
      s"(shiftleft(CAST(${a(0)} AS BIGINT), ${a(1)}) | " +
        s"shiftrightunsigned(CAST(${a(0)} AS BIGINT), 64 - (${a(1)})))")
    q = rewriteCalls(q, "bitRotateRight")(a =>
      s"(shiftrightunsigned(CAST(${a(0)} AS BIGINT), ${a(1)}) | " +
        s"shiftleft(CAST(${a(0)} AS BIGINT), 64 - (${a(1)})))")
    // empty-array guard: pmod(k, 0) is NULL, which would NULL the whole
    // rotate; CH rotates of [] are []
    q = rewriteCalls(q, "arrayRotateLeft")(a =>
      s"(CASE WHEN size(${a(0)}) = 0 THEN ${a(0)} ELSE " +
        s"concat(slice(${a(0)}, pmod(${a(1)}, size(${a(0)})) + 1, " +
        s"size(${a(0)}) - pmod(${a(1)}, size(${a(0)}))), " +
        s"slice(${a(0)}, 1, pmod(${a(1)}, size(${a(0)})))) END)")
    q = rewriteCalls(q, "arrayRotateRight")(a =>
      s"(CASE WHEN size(${a(0)}) = 0 THEN ${a(0)} ELSE " +
        s"concat(slice(${a(0)}, pmod(-(${a(1)}), size(${a(0)})) + 1, " +
        s"size(${a(0)}) - pmod(-(${a(1)}), size(${a(0)}))), " +
        s"slice(${a(0)}, 1, pmod(-(${a(1)}), size(${a(0)})))) END)")
    // size < shingle length is an error in CH (arrayShingles.cpp:66);
    // a template can't throw, so yield [] instead of letting
    // sequence(1, n<=0) descend into nonsense windows
    q = rewriteCalls(q, "arrayShingles") { a =>
      // a LITERAL non-positive length is ARGUMENT_OUT_OF_BOUND at
      // analysis in the reference (02891)
      if (a(1).trim.matches("-?\\d+") && a(1).trim.toLong <= 0)
        throw new IllegalArgumentException(
          "ARGUMENT_OUT_OF_BOUND: shingle length must be positive")
      s"transform(slice(sequence(0, greatest(size(${a(0)}) - (${a(1)}) + 1, 0)), " +
        s"2, greatest(size(${a(0)}) - (${a(1)}) + 1, 0)), " +
        s"__i -> slice(${a(0)}, __i, ${a(1)}))"
    }
    // simpleJSON* share the JSONExtract default contract (visitParam*
    // legacy family): missing -> '' / 0, NULL input -> NULL
    q = rewriteCalls(q, "simpleJSONExtractString")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(get_json_object(${a(0)}, ${jsonPath(a)}), '') END)")
    q = rewriteCalls(q, "simpleJSONExtractInt")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(try_cast(get_json_object(${a(0)}, ${jsonPath(a)}) AS BIGINT), 0) END)")
    q = rewriteCalls(q, "simpleJSONHas")(a =>
      s"(get_json_object(${a(0)}, ${jsonPath(a)}) IS NOT NULL)")
    q = rewriteCalls(q, "port")(a =>
      s"coalesce(try_cast(regexp_extract(${a(0)}, '://[^/?#]*:([0-9]+)', 1) AS INT), 0)")
    q = rewriteCalls(q, "cutFragment")(a => s"regexp_replace(${a(0)}, '#.*$$', '')")
    q = rewriteCalls(q, "cutWWW")(a => s"regexp_replace(${a(0)}, '(://)www\\\\.', '$$1')")
    // vector distances over double arrays (sequential fold = kernel order);
    // explicit ARRAY<DOUBLE> casts so decimal/int literals reach the kernels
    val vecD = (x: String) => s"CAST($x AS ARRAY<DOUBLE>)"
    q = rewriteCalls(q, "cosineDistance")(a => s"(1.0 - cosine_sim(${vecD(a(0))}, ${vecD(a(1))}))")
    q = rewriteCalls(q, "arrayCosineDistance")(a => s"(1.0 - cosine_sim(${vecD(a(0))}, ${vecD(a(1))}))")
    q = rewriteCalls(q, "arrayDotProduct")(a => s"dot_product(${vecD(a(0))}, ${vecD(a(1))})")
    q = rewriteCalls(q, "dotProduct")(a => s"dot_product(${vecD(a(0))}, ${vecD(a(1))})")
    q = rewriteCalls(q, "L1Distance")(a =>
      s"aggregate(zip_with(${vecD(a(0))}, ${vecD(a(1))}, (__x, __y) -> abs(__x - __y)), " +
        s"CAST(0 AS DOUBLE), (__a, __v) -> __a + __v)")
    q = rewriteCalls(q, "L2SquaredDistance")(a =>
      s"aggregate(zip_with(${vecD(a(0))}, ${vecD(a(1))}, (__x, __y) -> (__x - __y) * (__x - __y)), " +
        s"CAST(0 AS DOUBLE), (__a, __v) -> __a + __v)")
    q = rewriteCalls(q, "L2Distance")(a =>
      s"sqrt(aggregate(zip_with(${vecD(a(0))}, ${vecD(a(1))}, (__x, __y) -> (__x - __y) * (__x - __y)), " +
        s"CAST(0 AS DOUBLE), (__a, __v) -> __a + __v))")
    q = rewriteCalls(q, "LinfDistance")(a =>
      s"array_max(zip_with(${vecD(a(0))}, ${vecD(a(1))}, (__x, __y) -> abs(__x - __y)))")
    q = rewriteCalls(q, "L1Norm")(a =>
      s"aggregate(${vecD(a(0))}, CAST(0 AS DOUBLE), (__a, __v) -> __a + abs(__v))")
    q = rewriteCalls(q, "L2Norm")(a =>
      s"sqrt(aggregate(${vecD(a(0))}, CAST(0 AS DOUBLE), (__a, __v) -> __a + __v * __v))")
    // round-10 batch 21: Lp generalizations + normalize* (reference
    // vectorFunctions.cpp TupleOrArrayFunctionLpNorm / FunctionLNormalize)
    def lpNormBody(arr: String, p: String): String =
      s"power(aggregate(${vecD(arr)}, CAST(0 AS DOUBLE), " +
        s"(__a, __v) -> __a + power(abs(__v), $p)), 1.0 / ($p))"
    q = rewriteCalls(q, "LpNorm")(a => lpNormBody(a(0), a(1)))
    q = rewriteCalls(q, "normLp")(a => lpNormBody(a(0), a(1)))
    q = rewriteCalls(q, "LpDistance")(a =>
      s"power(aggregate(zip_with(${vecD(a(0))}, ${vecD(a(1))}, " +
        s"(__x, __y) -> power(abs(__x - __y), ${a(2)})), CAST(0 AS DOUBLE), " +
        s"(__a, __v) -> __a + __v), 1.0 / (${a(2)}))")
    q = rewriteCalls(q, "distanceLp")(a =>
      s"power(aggregate(zip_with(${vecD(a(0))}, ${vecD(a(1))}, " +
        s"(__x, __y) -> power(abs(__x - __y), ${a(2)})), CAST(0 AS DOUBLE), " +
        s"(__a, __v) -> __a + __v), 1.0 / (${a(2)}))")
    q = rewriteCalls(q, "normalizeL1")(a =>
      s"transform(${vecD(a(0))}, __n -> __n / " +
        s"aggregate(${vecD(a(0))}, CAST(0 AS DOUBLE), (__a, __v) -> __a + abs(__v)))")
    q = rewriteCalls(q, "normalizeL2")(a =>
      s"transform(${vecD(a(0))}, __n -> __n / " +
        s"sqrt(aggregate(${vecD(a(0))}, CAST(0 AS DOUBLE), (__a, __v) -> __a + __v * __v)))")
    q = rewriteCalls(q, "normalizeLinf")(a =>
      s"transform(${vecD(a(0))}, __n -> __n / " +
        s"array_max(transform(${vecD(a(0))}, __v -> abs(__v))))")
    q = rewriteCalls(q, "normalizeLp")(a =>
      s"transform(${vecD(a(0))}, __n -> __n / ${lpNormBody(a(0), a(1))})")
    // pointInPolygon((px,py), [(x1,y1), …]): even-odd ray cast expanded
    // at rewrite time over the LITERAL vertex list (reference
    // src/Functions/pointInPolygon.cpp; the non-literal polygon form is
    // the DataFrame path, queries/Geo.q_point_in_polygon)
    q = rewriteCalls(q, "pointInPolygon") { a =>
      // non-literal polygons (column/subquery) fall through unrewritten
      case class NotLiteral() extends RuntimeException
      def tup(s: String): (String, String) =
        "^\\s*\\(\\s*(.+?)\\s*,\\s*(.+?)\\s*\\)\\s*$".r.findFirstMatchIn(s.trim)
          .map(m => (m.group(1), m.group(2)))
          .getOrElse(throw NotLiteral())
      try {
      val (px0, py0) = tup(a(0))
      val px = s"CAST($px0 AS DOUBLE)"; val py = s"CAST($py0 AS DOUBLE)"
      def stripArr(s0: String): String = {
        val s = s0.trim
        if (s.startsWith("[")) s.stripPrefix("[").stripSuffix("]")
        else if (s.toLowerCase.startsWith("array(")) s.drop(6).dropRight(1)
        else throw NotLiteral()
      }
      def parseRing(s: String): Seq[(String, String)] = {
        val vs0 = splitArgs(stripArr(s)).map(_.trim).filter(_.nonEmpty).map(tup)
        require(vs0.length >= 3, "pointInPolygon: a ring needs >= 3 vertices")
        // the reference validates rings (validate_polygons = 1 default,
        // BAD_ARGUMENTS on self-intersection) — check literal coordinates
        val nums = vs0.map { case (x, y) => (x.trim.toDoubleOption, y.trim.toDoubleOption) }
        if (nums.forall(p => p._1.isDefined && p._2.isDefined)) {
          val pts0 = nums.map(p => (p._1.get, p._2.get))
          // coordinates beyond the reference's grid range are rejected
          // (01700-class UBSan guards: Int64-extreme vertices error)
          if (pts0.exists(p => math.abs(p._1) > 1e15 || math.abs(p._2) > 1e15))
            throw new IllegalArgumentException(
              "BAD_ARGUMENTS: polygon vertex coordinate out of range")
          val pts = if (pts0.length > 1 && pts0.head == pts0.last) pts0.dropRight(1) else pts0
          val n = pts.length
          def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
            (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
          for (i <- 0 until n; j <- i + 1 until n
               if (j + 1) % n != i && (i + 1) % n != j) {
            val (p1, p2) = (pts(i), pts((i + 1) % n))
            val (p3, p4) = (pts(j), pts((j + 1) % n))
            val d1 = cross(p3, p4, p1); val d2 = cross(p3, p4, p2)
            val d3 = cross(p1, p2, p3); val d4 = cross(p1, p2, p4)
            if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
                ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0)))
              throw new IllegalArgumentException(
                "BAD_ARGUMENTS: polygon is not valid (self-intersecting ring)")
          }
        }
        vs0
      }
      // rings: either one arg per ring (outer, hole1, …) or one
      // nested array-of-rings arg ([[outer], [hole], …]); even-odd
      // crossing count over ALL rings handles holes uniformly
      val ringArgs = locally {
        val parts = splitArgs(stripArr(a(1))).map(_.trim)
        val nested = parts.headOption.exists(p =>
          p.startsWith("[") || p.toLowerCase.startsWith("array("))
        if (nested) parts else a.drop(1)
      }
      val terms = ringArgs.flatMap { ringTxt =>
        val vs = parseRing(ringTxt)
          .map { case (x, y) => (s"CAST($x AS DOUBLE)", s"CAST($y AS DOUBLE)") }
        vs.indices.map { i =>
          val (vx, vy) = vs(i); val (wx, wy) = vs((i + 1) % vs.length)
          s"(CASE WHEN (($vy > $py) != ($wy > $py)) AND " +
            s"($px < ($wx - $vx) * ($py - $vy) / ($wy - $vy) + $vx) THEN 1 ELSE 0 END)"
        }
      }
      s"((${terms.mkString(" + ")}) % 2)"
      } catch { case NotLiteral() => s"pointInPolygon(${a.mkString(", ")})" }
    }
    // two empty arrays are an ILLEGAL_TYPE in the reference (02737) —
    // raise instead of the IEEE 0/0 the float-division rule would give
    q = rewriteCalls(q, "arrayJaccardIndex")(a =>
      s"(CASE WHEN size(array_union(${a(0)}, ${a(1)})) = 0 THEN " +
        s"CAST(raise_error('ILLEGAL_TYPE_OF_ARGUMENT: arrayJaccardIndex of empty arrays') AS DOUBLE) " +
        s"ELSE CAST(size(array_intersect(${a(0)}, ${a(1)})) AS DOUBLE) " +
        s"/ size(array_union(${a(0)}, ${a(1)})) END)")
    // parameterized quantile sketch variants -> percentile_approx; the
    // multi-level quantiles[Exact](p1, p2, …)(x) forms -> array results
    q = q.replaceAll("""\bquantilesExact\(([^)]*)\)\s*\(([^)]*)\)""", "percentile($2, array($1))")
    // quantile[s]Timing: the reference's small-count path answers
    // sorted[floor(level * n)] clamped to the last element, values
    // saturate into [0, 30000] (QuantileTiming.h small/medium states)
    locally {
      def timingBody(x: String, p: String): String = {
        val lst = s"sort_array(collect_list(least(greatest(CAST($x AS BIGINT), 0), 30000)))"
        s"element_at($lst, least(CAST(floor(size($lst) * ($p)) AS INT) + 1, size($lst)))"
      }
      // Weighted forms: weight-expanded multiset (each value counted w
      // times), same floor(level*n) selection; all-zero weights -> nan
      // (QuantileTiming.h get() on an empty state)
      def timingWBody(x: String, w: String, p: String): String = {
        val lst = s"sort_array(flatten(collect_list(array_repeat(" +
          s"least(greatest(CAST($x AS BIGINT), 0), 30000), CAST($w AS INT)))))"
        s"(CASE WHEN size($lst) = 0 THEN CAST('NaN' AS DOUBLE) " +
          s"ELSE CAST(element_at($lst, least(CAST(floor(size($lst) * ($p)) AS INT) + 1, " +
          s"size($lst))) AS DOUBLE) END)"
      }
      q = q.replaceAll("""\bquantilesTimingWeighted\(([^)]*)\)\s*\(([^(),]+),([^()]*)\)""",
        "transform(array($1), __p -> " + timingWBody("$2", "$3", "__p") + ")")
      q = q.replaceAll("""\bquantileTimingWeighted\(([^)]*)\)\s*\(([^(),]+),([^()]*)\)""",
        timingWBody("$2", "$3", "$1"))
      q = rewriteCalls(q, "medianTimingWeighted")(a => timingWBody(a(0), a(1), "0.5"))
      q = rewriteCalls(q, "medianTiming")(a => timingBody(a(0), "0.5"))
      q = q.replaceAll("""\bquantilesTiming\(([^)]*)\)\s*\(([^()]*)\)""",
        "transform(array($1), __p -> " + timingBody("$2", "__p") + ")")
      q = q.replaceAll("""\bquantileTiming\(([^)]*)\)\s*\(([^()]*)\)""",
        timingBody("$2", "$1"))
      // bare 1-arg form = median (registerAggregateFunctions: level 0.5)
      q = rewriteCalls(q, "quantileTiming")(a =>
        if (a.length == 1) timingBody(a(0), "0.5")
        else s"quantileTiming(${a.mkString(", ")})")
    }
    q = q.replaceAll("""\bquantiles\(([^)]*)\)\s*\(([^)]*)\)""", "percentile_approx($2, array($1))")
    // plural sketch spellings share the approx mapping (the reference's
    // TDigest/BFloat16 sketches converge to these on test-sized data)
    q = q.replaceAll(
      """\bquantiles(?:TDigest|BFloat16)\(([^)]*)\)\s*\(([^)]*)\)""",
      "percentile_approx($2, array($1))")
    q = q.replaceAll(
      """\bquantile(?:TDigest|BFloat16|Timing)\(([0-9.]+)\)\s*\(([^)]*)\)""",
      "percentile_approx($2, $1)")
    // quantileDeterministic(p)(x, determinator): the determinator only
    // fixes sub-sampling reproducibility in the reference; the estimate
    // itself is the sketch quantile of x.
    q = q.replaceAll(
      """\bquantileDeterministic\(([0-9.]+)\)\s*\(([^,)]+)[^)]*\)""",
      "percentile_approx($2, $1)")

    // parameterized-aggregate syntax quantile[Exact](p)(x) -> percentile(x, p)
    // for ANY literal level (the old fixed-level list missed e.g. 0.2)
    q = rewriteParamCalls(q, "quantileExact")((p, a) => s"percentile(${a(0)}, ${p(0)})")
    q = rewriteParamCalls(q, "quantile")((p, a) => s"percentile(${a(0)}, ${p(0)})")
    q = rewriteCalls(q, "quantileExact")(a => s"percentile(${a(0)}, 0.5)")
    // bare quantile(x) defaults to the median level (quantile.xml) —
    // without this the simple-name map emits a 1-arg percentile_approx
    q = rewriteCalls(q, "quantile")(a =>
      if (a.length == 1) s"percentile_approx(${a(0)}, 0.5)"
      else s"percentile_approx(${a.mkString(", ")})")
    // plural weighted form: Spark's percentile takes a frequency column
    q = q.replaceAll(
      """\bquantilesExactWeighted\(([^)]*)\)\s*\(([^,()]+),([^()]*)\)""",
      "percentile($2, array($1), CAST($3 AS BIGINT))")
    // plural deterministic form: the determinator only seeds the
    // reference's sub-sampling — below the sample cap the estimate is
    // the exact quantile
    q = q.replaceAll(
      """\bquantilesDeterministic\(([^)]*)\)\s*\(\s*([^,()]+),[^()]*\)""",
      "percentile($2, array($1))")

    // ---- batch 5 templates ----
    // mapApply((k, v) -> (k', v'), m): tuple lambda -> entry transform.
    // The lambda variables are substituted textually (word-boundary) into
    // the entry-struct expression.
    q = rewriteCalls(q, "mapApply") { a =>
      val lam = """(?s)\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*->\s*\((.+)\)\s*""".r
      a(0).trim match {
        case lam(k, v, body) =>
          val parts = splitArgs(body)
          def sub(s: String) = s
            .replaceAll(s"\\b$k\\b", "(__e.key)")
            .replaceAll(s"\\b$v\\b", "(__e.value)")
          s"map_from_entries(transform(map_entries(${a(1)}), " +
            s"__e -> named_struct('key', ${sub(parts(0))}, 'value', ${sub(parts(1))})))"
        case other => s"mapApply($other, ${a(1)})" // unrecognized: leave as-is
      }
    }
    // mapUpdate(m1, m2): m2 wins on key collision
    q = rewriteCalls(q, "mapUpdate")(a =>
      s"map_concat(map_filter(${a(0)}, (__k, __v) -> NOT map_contains_key(${a(1)}, __k)), ${a(1)})")
    // mapPopulateSeries(m[, max]): fill integer keys min..max with 0 default
    q = rewriteCalls(q, "mapPopulateSeries") { a =>
      val m = a(0)
      val hi = if (a.length > 1) a(1) else s"array_max(map_keys($m))"
      s"map_from_entries(transform(sequence(array_min(map_keys($m)), $hi), " +
        s"__k -> named_struct('key', __k, 'value', coalesce(element_at($m, __k), 0))))"
    }
    // arrayDifference: [0, a2-a1, a3-a2, …]
    q = rewriteCalls(q, "arrayDifference")(a =>
      s"transform(${a(0)}, (__x, __i) -> CASE WHEN __i = 0 THEN 0 " +
        s"ELSE __x - element_at(${a(0)}, __i) END)")
    // arrayEnumerateDense: 1-based rank of first appearance
    q = rewriteCalls(q, "arrayEnumerateDense")(a =>
      s"transform(${a(0)}, __x -> array_position(array_distinct(${a(0)}), __x))")
    // arrayReduce('agg', arr) / arrayReduceInRanges('agg', ranges, arr):
    // dispatch the (quoted) aggregate name; InRanges (reference
    // arrayReduceInRanges.cpp) applies it per (offset, length) slice
    def reduceBody(aggName: String, arr: String): String =
      aggName.replaceAll("'", "").trim.toLowerCase match {
        case "max" => s"array_max($arr)"
        case "min" => s"array_min($arr)"
        case "count" => s"size($arr)"
        case "avg" =>
          s"(aggregate($arr, CAST(0 AS DOUBLE), (__a, __x) -> __a + __x) / size($arr))"
        case "uniq" | "uniqexact" => s"size(array_distinct($arr))"
        case "any" => s"element_at($arr, 1)"
        case "anylast" => s"element_at($arr, -1)"
        case _ => s"aggregate($arr, CAST(0 AS DOUBLE), (__a, __x) -> __a + __x)" // sum
      }
    q = rewriteCalls(q, "arrayReduceInRanges")(a =>
      s"transform(${a(1)}, __r -> " +
        s"${reduceBody(a(0), s"slice(${a(2)}, __r.col1, __r.col2)")})")
    q = rewriteCalls(q, "arrayReduce")(a => reduceBody(a(0), a(1)))
    // ---- round-10 batch 21: tuple/vector arithmetic + array tail ----
    // (reference src/Functions/vectorFunctions.cpp, tuple*.cpp,
    // array/arrayAUC.cpp, emptyArrayToSingle.cpp)
    for (op <- Seq("Plus" -> "plus", "Minus" -> "minus",
        "Multiply" -> "multiply", "Divide" -> "divide", "Modulo" -> "modulo",
        "IntDiv" -> "int_div", "IntDivOrZero" -> "int_div_or_zero")) {
      q = rewriteCalls(q, s"tuple${op._1}ByNumber")(a =>
        s"tuple_${op._2}_by_number(${a(0)}, ${a(1)})")
      q = rewriteCalls(q, s"tuple${op._1}")(a =>
        s"tuple_${op._2}(${a(0)}, ${a(1)})")
    }
    q = rewriteCalls(q, "vectorSum")(a => s"tuple_plus(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "vectorDifference")(a => s"tuple_minus(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "arrayPRAUC")(a => s"array_pr_auc(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "arrayAUCPR")(a => s"array_pr_auc(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "emptyArrayToSingle")(a =>
      s"empty_array_to_single(${a(0)})")
    // arrayPartialShuffle(arr[, limit[, seed]]): with a seed the result
    // is deterministic (splitmix64 Fisher-Yates — the CONTRACT of the
    // reference's seeded shuffle; the exact permutation per seed is
    // RNG-specific and documented non-portable)
    q = rewriteCalls(q, "arrayPartialShuffle")(a =>
      if (a.length >= 3) s"ch_partial_shuffle(${a.mkString(", ")})"
      else s"shuffle(${a(0)})")
    q = rewriteCalls(q, "arrayShuffle")(a =>
      if (a.length >= 2) s"ch_partial_shuffle(${a(0)}, 0, ${a(1)})"
      else s"shuffle(${a(0)})")
    // partial sorts: the full sort is a valid refinement of "first n
    // sorted, tail arbitrary" (arrayPartialSort above does the same)
    q = rewriteCalls(q, "arrayPartialReverseSort")(a =>
      s"reverse(array_sort(${a(1)}))")
    // Ranked enumerations at depth 1 equal their base functions
    // (arrayEnumerateRanked.h clear_depth=1); the bare-integer argument
    // form skips the depth prefix
    def rankedArr(a: Seq[String]): String =
      if (a(0).trim.matches("^\\d+$") && a.length > 1) a(1) else a(0)
    q = rewriteCalls(q, "arrayEnumerateUniqRanked") { a =>
      val arr = rankedArr(a)
      s"transform(slice(sequence(0, size($arr)), 2, size($arr)), __i -> " +
        s"size(filter(slice($arr, 1, __i), __x -> __x = element_at($arr, __i))))"
    }
    q = rewriteCalls(q, "arrayEnumerateDenseRanked")(a =>
      s"transform(${rankedArr(a)}, __x -> " +
        s"array_position(array_distinct(${rankedArr(a)}), __x))")
    for (n <- Seq("tupleConcat" -> "tuple_concat", "tupleNames" -> "tuple_names",
        "tupleToNameValuePairs" -> "tuple_to_name_value_pairs",
        "tupleHammingDistance" -> "tuple_hamming_distance",
        "flattenTuple" -> "flatten_tuple", "tupleNegate" -> "tuple_negate"))
      q = rewriteCalls(q, n._1)(a => s"${n._2}(${a.mkString(", ")})")
    // untuple(t) expands the tuple into one column per element (reference
    // src/Functions/untuple — ASTFunction special form); Spark's inline
    // generator over a one-struct array produces exactly that shape
    q = rewriteCalls(q, "untuple")(a => s"inline(array(${a(0)}))")
    // addTupleOfIntervals(ts, (i1, i2, …)): apply the intervals left to
    // right (reference vectorFunctions.cpp:523 chains `plus`)
    def chainIntervals(base: String, tup: String, opSign: String): String = {
      val inner = tup.trim.stripPrefix("tuple(").stripPrefix("struct(")
        .stripPrefix("(").stripSuffix(")")
      splitArgs(inner).foldLeft(s"(${base})")((acc, iv) => s"($acc $opSign $iv)")
    }
    q = rewriteCalls(q, "addTupleOfIntervals")(a =>
      chainIntervals(a(0), a(1), "+"))
    q = rewriteCalls(q, "subtractTupleOfIntervals")(a =>
      chainIntervals(a(0), a(1), "-"))
    // mapAll / mapPartialSort / mapPartialReverseSort (mapAll shares the
    // HOF lambda-first convention; partial sorts refine to full sorts)
    q = rewriteCalls(q, "mapAll")(a =>
      s"(cardinality(map_filter(${a(1)}, ${a(0)})) = cardinality(${a(1)}))")
    q = rewriteCalls(q, "mapPartialSort")(a =>
      s"map_from_entries(array_sort(map_entries(${a.last})))")
    q = rewriteCalls(q, "mapPartialReverseSort")(a =>
      s"map_from_entries(reverse(array_sort(map_entries(${a.last}))))")
    // tupleElement(t, N) / tupleElement(t, 'name'); struct() names are colN
    q = rewriteCalls(q, "tupleElement") { a =>
      val idx = a(1).trim
      // numeric index = POSITIONAL access (CH tuples are positional;
      // struct field names vary with how the tuple was built)
      if (idx.matches("[0-9]+")) s"tuple_element_at(${a(0)}, $idx)"
      else s"(${a(0)}).${idx.replaceAll("'", "")}"
    }
    q = rewriteCalls(q, "e")(_ => "exp(1)")
    q = rewriteCalls(q, "netloc")(a => s"parse_url(${a(0)}, 'AUTHORITY')")
    q = rewriteCalls(q, "queryStringAndFragment")(a =>
      s"concat_ws('#', parse_url(${a(0)}, 'QUERY'), parse_url(${a(0)}, 'REF'))")
    q = rewriteCalls(q, "cutQueryStringAndFragment")(a =>
      s"regexp_replace(${a(0)}, '[?#].*$$', '')")
    q = rewriteCalls(q, "extractURLParameters")(a =>
      s"split(parse_url(${a(0)}, 'QUERY'), '&')")
    q = rewriteCalls(q, "regexpQuoteMeta")(a =>
      s"regexp_replace(${a(0)}, '([.^$$|?*+()\\\\[\\\\]{}\\\\\\\\])', '\\\\\\\\$$1')")
    q = rewriteCalls(q, "roundDuration") { a =>
      val b = Seq(1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800, 3600,
        7200, 18000, 36000)
      val whens = s"WHEN ${a(0)} < 1 THEN 0 " +
        b.init.zip(b.tail).map { case (lo, hi) =>
          s"WHEN ${a(0)} < $hi THEN $lo" }.mkString(" ")
      s"(CASE $whens ELSE 36000 END)"
    }
    q = rewriteCalls(q, "roundAge")(a =>
      s"(CASE WHEN ${a(0)} < 1 THEN 0 WHEN ${a(0)} < 18 THEN 17 " +
        s"WHEN ${a(0)} < 25 THEN 18 WHEN ${a(0)} < 35 THEN 25 " +
        s"WHEN ${a(0)} < 45 THEN 35 WHEN ${a(0)} < 55 THEN 45 ELSE 55 END)")

    // ---- batch 6 templates ----
    // visitParam* are the legacy names of the simpleJSON* family
    q = rewriteCalls(q, "visitParamExtractString")(a =>
      s"get_json_object(${a(0)}, ${jsonPath(a)})")
    q = rewriteCalls(q, "visitParamExtractInt")(a =>
      s"CAST(get_json_object(${a(0)}, ${jsonPath(a)}) AS BIGINT)")
    q = rewriteCalls(q, "visitParamHas")(a =>
      s"(get_json_object(${a(0)}, ${jsonPath(a)}) IS NOT NULL)")
    q = rewriteCalls(q, "toDate")(a => s"ch_to_date(${a(0)})")
    q = rewriteCalls(q, "toYYYYMMDDhhmmss")(a =>
      s"CAST(date_format(${a(0)}, 'yyyyMMddHHmmss') AS BIGINT)")
    // timeSlots(start, duration[, size]): every size-second window the
    // interval [start, start+duration] touches
    q = rewriteCalls(q, "timeSlots") { a =>
      val sz = if (a.length > 2) a(2) else "1800"
      // a zero slot size is ILLEGAL_COLUMN in the reference (00734) —
      // the float-division rule would otherwise turn it into an inf grid
      if (sz.trim.matches("0+(\\.0*)?"))
        throw new IllegalArgumentException(
          "ILLEGAL_COLUMN: timeSlots size must be positive")
      s"transform(sequence(CAST(floor(unix_timestamp(${a(0)}) / ($sz)) AS BIGINT), " +
        s"CAST(floor((unix_timestamp(${a(0)}) + (${a(1)})) / ($sz)) AS BIGINT)), " +
        s"__i -> timestamp_seconds(__i * ($sz)))"
    }
    // arrayROCAUC is the current spelling of arrayAUC (arrayAUC.cpp
    // registers both); the optional 3rd bool arg disables scaling —
    // unscaled = scaled * P * N
    // arrayAUC / arrayROCAUC (same function, arrayAUC.cpp registers
    // both): midrank formula with tie handling — scaled = (sum of
    // positive midranks - P(P+1)/2) / (P*N); unscaled (scale=false)
    // keeps the raw pair count (0, not nan, when P or N is 0).
    // O(n^2) per row, intended for per-row arrays.
    def aucBody(s0: String, l0: String, scaledCond: Option[String]): String = {
      // label positivity via string image: covers numeric labels (>0)
      // AND Enum/Bool spellings ('true'); reference isLabelPositive
      val pos = (l: String) => s"(CAST($l AS STRING) = 'true' OR " +
        s"try_cast(CAST($l AS STRING) AS DOUBLE) > 0)"
      val p = s"size(filter($l0, __l -> ${pos("__l")}))"
      val sumRanks = s"aggregate(zip_with($s0, $l0, (__s, __l) -> " +
        s"CASE WHEN ${pos("__l")} THEN (size(filter($s0, __x -> __x < __s)) + " +
        s"size(filter($s0, __x -> __x <= __s)) + 1) / 2.0 " +
        s"ELSE CAST(0 AS DOUBLE) END), CAST(0 AS DOUBLE), (__a2, __x2) -> __a2 + __x2)"
      val raw = s"($sumRanks - $p * ($p + 1) / 2.0)"
      val body = scaledCond match {
        case None => s"($raw / ($p * (size($l0) - $p)))"
        case Some(c) => s"(CASE WHEN ($c) THEN ($raw / ($p * (size($l0) - $p))) " +
          s"ELSE $raw END)"
      }
      // empty input and length mismatch raise in the reference
      // (BAD_ARGUMENTS: scores and labels must be equal-size, non-empty)
      s"(CASE WHEN size($s0) = 0 OR size($l0) = 0 OR size($s0) != size($l0) THEN " +
        s"CAST(raise_error('BAD_ARGUMENTS: arrayAUC needs equal-size non-empty arrays') AS DOUBLE) " +
        s"ELSE $body END)"
    }
    q = rewriteCalls(q, "arrayROCAUC") { a =>
      if (a.length >= 5 || a.length < 2)
        throw new IllegalArgumentException(
          "NUMBER_OF_ARGUMENTS_DOESNT_MATCH: arrayROCAUC takes 2 to 4 arguments")
      if (a.length >= 3 && !a(2).trim.toLowerCase.matches("true|false|0|1"))
        throw new IllegalArgumentException( // scale must be a const bool
          "ILLEGAL_TYPE_OF_ARGUMENT: arrayROCAUC scale must be a constant")
      if (a.length == 4 &&
          !a(3).replaceAll("(?i)array", "").replaceAll("[\\[\\]()\\s,]", "").matches("0+"))
        // non-zero partial offsets: the partial-AUC path is not emulated
        throw new IllegalArgumentException(
          "NOT_IMPLEMENTED: arrayROCAUC partial offsets")
      if (a.length == 2) aucBody(a(0), a(1), None)
      else aucBody(a(0), a(1), Some(a(2)))
    }
    q = rewriteCalls(q, "arrayAUC")(a =>
      if (a.length >= 3) aucBody(a(0), a(1), Some(a(2)))
      else aucBody(a(0), a(1), None))
    // CH integer arithmetic promotes to the next wider type (plus.cpp /
    // NumberTraits) — ch_plus/ch_minus/ch_multiply dispatch on resolved
    // types (graft.functions.ChArith); also covers date+int / date-date
    q = rewriteCalls(q, "abs")(a => s"ch_abs(${a(0)})")
    q = rewriteCalls(q, "plus")(a => s"ch_plus(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "minus")(a => s"ch_minus(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "multiply")(a => s"ch_multiply(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "negate")(a => s"ch_negate(${a(0)})")
    q = rewriteCalls(q, "isZeroOrNull")(a =>
      s"((${a(0)}) = 0 OR (${a(0)}) IS NULL)")
    // neighbor(x, offset, ord): deterministic engines need the explicit
    // order column (reference block-order semantics)
    q = rewriteCalls(q, "neighbor") { a =>
      val ord = if (a.length >= 3) a(2) else "monotonically_increasing_id()"
      val off = a(1).trim
      // offset must be a constant within Int64 (reference
      // FunctionNeighbor ARGUMENT_OUT_OF_BOUND; 01353 anchor shape) —
      // note -2^63 negates to 2^63 which is itself out of bound
      if (!off.matches("-?\\d+") ||
          (off.startsWith("-") && BigInt(off.drop(1)) > BigInt(Long.MaxValue)))
        throw new IllegalArgumentException(
          s"ARGUMENT_OUT_OF_BOUND: neighbor offset must be a bounded constant, got $off")
      if (off.startsWith("-")) s"lag(${a(0)}, ${off.drop(1)}) OVER (ORDER BY $ord)"
      else s"lead(${a(0)}, $off) OVER (ORDER BY $ord)"
    }
    q = rewriteCalls(q, "ignore")(_ => "0")
    // now()/today() are CONSTANT for the whole query in the reference
    // (evaluated at analysis); emitting literals also keeps them legal
    // inside aggregates, where Spark rejects non-deterministic exprs
    q = rewriteCalls(q, "now")(a =>
      if (a.exists(_.trim.nonEmpty)) s"current_timestamp(${a.mkString(", ")})"
      else "timestamp'" + java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")) + "'")
    q = rewriteCalls(q, "today")(_ =>
      "date'" + java.time.LocalDate.now(java.time.ZoneOffset.UTC) + "'")
    q = rewriteCalls(q, "formatReadableSize") { a =>
      val x = s"CAST(${a(0)} AS DOUBLE)"
      // index CLAMPED to the largest unit (reference formatReadable.h
      // runs out of units and keeps dividing by the last one)
      val ui = s"least(CAST(floor(log(greatest($x, 1.0)) / log(1024.0)) AS INT), 8)"
      s"format_string('%.2f %s', $x / power(1024.0, $ui), " +
        s"element_at(array('B', 'KiB', 'MiB', 'GiB', 'TiB', 'PiB', 'EiB', 'ZiB', 'YiB'), $ui + 1))"
    }
    q = rewriteCalls(q, "formatReadableDecimalSize") { a =>
      val x = s"CAST(${a(0)} AS DOUBLE)"
      val ui = s"least(CAST(floor(log(greatest($x, 1.0)) / log(1000.0)) AS INT), 8)"
      s"format_string('%.2f %s', $x / power(1000.0, $ui), " +
        s"element_at(array('B', 'KB', 'MB', 'GB', 'TB', 'PB', 'EB', 'ZB', 'YB'), $ui + 1))"
    }
    q = rewriteCalls(q, "formatReadableQuantity") { a =>
      val x = s"CAST(${a(0)} AS DOUBLE)"
      val ui = s"least(CAST(floor(log(greatest($x, 1.0)) / log(1000.0)) AS INT), 4)"
      s"trim(format_string('%.2f %s', $x / power(1000.0, $ui), " +
        s"element_at(array('', 'thousand', 'million', 'billion', 'trillion'), $ui + 1)))"
    }
    for ((n, t) <- Seq("emptyArrayUInt8" -> "SMALLINT", "emptyArrayInt64" -> "BIGINT",
        "emptyArrayFloat64" -> "DOUBLE", "emptyArrayString" -> "STRING",
        "emptyArrayDate" -> "DATE"))
      q = rewriteCalls(q, n)(_ => s"CAST(array() AS ARRAY<$t>)")
    // ---- batch 7 templates ----
    q = rewriteCalls(q, "sumCount")(a =>
      s"named_struct('sum', sum(${a(0)}), 'count', count(${a(0)}))")
    q = rewriteCalls(q, "uniqCombined64")(a =>
      s"approx_count_distinct(${a.mkString(", ")})")
    // quantileGK(accuracy)(x): Spark's approx_percentile IS Greenwald-Khanna
    q = q.replaceAll("""\bquantileGK\(([0-9]+)\)\s*\(([^)]*)\)""",
      "approx_percentile($2, 0.5, $1)")
    // quantileDD(relative_accuracy[, level])(x) (reference DDSketch,
    // AggregateFunctionDDSketch.cpp): the REAL log-bucket sketch
    // (aggregates.DDSketchAggregator) serves the registered
    // (alpha=0.01, level in {.5,.9,.99}) configurations; other shapes
    // fall back to GK with accuracy ceil(1/alpha)
    q = """\bquantileDD\(([0-9.]+)(?:\s*,\s*([0-9.]+))?\)\s*\(([^)]*)\)""".r
      .replaceAllIn(q, m => {
        val acc = m.group(1).toDouble
        val level = Option(m.group(2)).map(_.toDouble).getOrElse(0.5)
        val pct = math.round(level * 100).toInt
        val arg = java.util.regex.Matcher.quoteReplacement(m.group(3))
        if (acc == 0.01 && Set(50, 90, 99)(pct)) s"quantile_dd_$pct($arg)"
        else s"approx_percentile($arg, $level, ${math.ceil(1.0 / acc).toInt})"
      })

    // ---- batch 8 templates ----
    // JSON introspection (reference src/Functions/FunctionsJSON.cpp).
    // One optional trailing key addresses into the document, as in the
    // simpleJSON family; deeper CH index paths are out of scope.
    def jsonAt(a: Seq[String]): String =
      if (a.length > 1) s"get_json_object(${a(0)}, ${jsonPath(a)})" else a(0)
    // missing path -> type default ([] / 0), matching the JSONExtract
    // contract (FunctionsJSON.cpp:167); NULL json still propagates
    q = rewriteCalls(q, "JSONExtractKeys")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(json_object_keys(${jsonAt(a)}), array()) END)")
    q = rewriteCalls(q, "JSONLength")(a =>
      s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE " +
        s"coalesce(json_array_length(${jsonAt(a)}), 0) END)")
    // JSONType classification from the raw extract. Caveat (documented):
    // get_json_object dequotes scalars, so a string of digits classifies
    // as Number — containers/bools/nulls are exact.
    q = rewriteCalls(q, "JSONType") { a =>
      val v = jsonAt(a)
      s"(CASE WHEN ($v) IS NULL THEN 'Null' " +
        s"WHEN substring(trim($v), 1, 1) = '{' THEN 'Object' " +
        s"WHEN substring(trim($v), 1, 1) = '[' THEN 'Array' " +
        s"WHEN ($v) IN ('true', 'false') THEN 'Bool' " +
        s"WHEN try_cast($v AS DOUBLE) IS NOT NULL THEN 'Number' " +
        s"ELSE 'String' END)"
    }
    // raw elements of a scalar JSON array
    q = rewriteCalls(q, "JSONExtractArrayRaw")(a =>
      s"from_json(${jsonAt(a)}, 'ARRAY<STRING>')")

    // ---- batch 9 templates ----
    // Bitmap family (reference src/Functions/FunctionsBitmap.h,
    // AggregateFunctionGroupBitmap.cpp). The reference's RoaringBitmap is a
    // storage encoding; the SEMANTICS are set algebra, emulated here on a
    // canonical sorted-distinct array. Same results for every query-level
    // use; the binary State form is out of scope (documented).
    q = rewriteCalls(q, "bitmapBuild")(a => s"array_sort(array_distinct(${a(0)}))")
    q = rewriteCalls(q, "bitmapToArray")(a => a(0))
    q = rewriteCalls(q, "bitmapCardinality")(a => s"size(${a(0)})")
    // empty-bitmap defaults (00829): min of empty = type max (roaring32
    // UINT32_MAX, or UINT64_MAX for the 64-bit build), max of empty = 0
    q = rewriteCalls(q, "bitmapMin")(a => {
      // 64-bit default detection: type text in the call itself, or — for
      // a bare column reference — the DECLARED type in tableColMeta
      // (a UInt64 bitmap column carries no type text at the call site)
      val arg = a(0).trim
      // resolve the declared type against the QUERIED tables only — a
      // same-named UInt64 column in an unrelated table must not widen
      // this table's UInt32 bitmap default
      val queried = "(?i)\\b(?:FROM|JOIN)\\s+`?([\\w.]+)`?".r
        .findAllMatchIn(q).map(_.group(1).stripPrefix("default.")).toSet
      val declared64 = arg.matches("[A-Za-z_][A-Za-z0-9_]*") &&
        queried.exists(t => tableColMeta.get(t).exists(_.exists(c =>
          c._1 == arg && c._2.contains("UInt64"))))
      s"coalesce(array_min(${a(0)}), " +
        s"${if (a(0).contains("UInt64") || a(0).contains("DECIMAL(20") || declared64)
            "18446744073709551615" else "4294967295"})"
    })
    q = rewriteCalls(q, "bitmapMax")(a => s"coalesce(array_max(${a(0)}), 0)")
    q = rewriteCalls(q, "bitmapAnd")(a =>
      s"array_sort(array_intersect(${a(0)}, ${a(1)}))")
    q = rewriteCalls(q, "bitmapOr")(a =>
      s"array_sort(array_union(${a(0)}, ${a(1)}))")
    q = rewriteCalls(q, "bitmapXor")(a =>
      s"array_sort(array_except(array_union(${a(0)}, ${a(1)}), " +
        s"array_intersect(${a(0)}, ${a(1)})))")
    q = rewriteCalls(q, "bitmapAndnot")(a =>
      s"array_sort(array_except(${a(0)}, ${a(1)}))")
    // CAST to INT: the reference returns UInt8, so `0 = bitmapContains(..)`
    // comparisons type-check (00829), and 1/0 renders either way
    q = rewriteCalls(q, "bitmapContains")(a =>
      s"CAST(array_contains(${a(0)}, ${a(1)}) AS INT)")
    // subset ops (reference bitmapSubsetInRange/Limit, subBitmap,
    // bitmapTransform over our sorted-distinct-array representation)
    q = rewriteCalls(q, "bitmapSubsetInRange")(a =>
      s"filter(${a(0)}, __x -> __x >= ${a(1)} AND __x < ${a(2)})")
    q = rewriteCalls(q, "bitmapSubsetLimit")(a =>
      s"slice(filter(${a(0)}, __x -> __x >= ${a(1)}), 1, ${a(2)})")
    q = rewriteCalls(q, "subBitmap")(a =>
      s"slice(${a(0)}, CAST(${a(1)} AS INT) + 1, CAST(${a(2)} AS INT))")
    // bitmapTransform applies (from -> to) pairs SEQUENTIALLY: each pair
    // removes `from` (if present) and adds `to` — a later pair can then
    // move the just-added value again (00829 line 44 pins this)
    q = rewriteCalls(q, "bitmapTransform")(a =>
      s"array_sort(array_distinct(aggregate(" +
        s"zip_with(${a(1)}, ${a(2)}, (__f, __t) -> " +
        s"named_struct('f', CAST(__f AS BIGINT), 't', CAST(__t AS BIGINT))), " +
        s"CAST(${a(0)} AS ARRAY<BIGINT>), " +
        s"(__acc, __p) -> CASE WHEN array_contains(__acc, __p.f) " +
        s"THEN array_union(array_except(__acc, array(__p.f)), array(__p.t)) " +
        s"ELSE __acc END)))")
    q = rewriteCalls(q, "bitmapHasAny")(a =>
      s"CAST(arrays_overlap(${a(0)}, ${a(1)}) AS INT)")
    q = rewriteCalls(q, "bitmapHasAll")(a =>
      s"CAST(size(array_except(${a(1)}, ${a(0)})) = 0 AS INT)")
    q = rewriteCalls(q, "bitmapAndCardinality")(a =>
      s"size(array_intersect(${a(0)}, ${a(1)}))")
    q = rewriteCalls(q, "bitmapOrCardinality")(a =>
      s"size(array_union(${a(0)}, ${a(1)}))")
    q = rewriteCalls(q, "bitmapXorCardinality")(a =>
      s"size(array_except(array_union(${a(0)}, ${a(1)}), " +
        s"array_intersect(${a(0)}, ${a(1)})))")
    q = rewriteCalls(q, "bitmapAndnotCardinality")(a =>
      s"size(array_except(${a(0)}, ${a(1)}))")
    q = rewriteCalls(q, "groupBitmap")(a => s"count(DISTINCT ${a(0)})")
    // array tail: fold / partial sort / symmetric difference / enumerate
    // (reference src/Functions/array/arrayFold.cpp etc.)
    q = rewriteCalls(q, "arrayFold")(a =>
      s"aggregate(${a(1)}, ${a(2)}, ${a(0)})")
    // CH leaves the tail beyond `limit` in unspecified order — a fully
    // sorted array satisfies the contract
    q = rewriteCalls(q, "arrayPartialSort")(a => s"array_sort(${a(1)})")
    q = rewriteCalls(q, "arraySymmetricDifference")(a =>
      s"array_sort(array_except(array_union(${a(0)}, ${a(1)}), " +
        s"array_intersect(${a(0)}, ${a(1)})))")
    // 1-based occurrence index of each element among its equals
    q = rewriteCalls(q, "arrayEnumerateUniq") { a =>
      val arr = a(0)
      s"transform(slice(sequence(0, size($arr)), 2, size($arr)), __i -> " +
        s"size(filter(slice($arr, 1, __i), __x -> __x = element_at($arr, __i))))"
    }

    // ---- batch 10 templates ----
    // hasSubsequence (reference src/Functions/hasSubsequence.cpp): fold
    // over haystack chars advancing a needle pointer — declarative, stays
    // in codegen.
    def subseq(h: String, n: String): String =
      s"(aggregate(split($h, ''), 0, (__p, __c) -> " +
        s"IF(__p < length($n) AND __c = substring($n, __p + 1, 1), __p + 1, __p)) " +
        s"= length($n))"
    q = rewriteCalls(q, "hasSubsequenceCaseInsensitive")(a =>
      subseq(s"lower(${a(0)})", s"lower(${a(1)})"))
    q = rewriteCalls(q, "hasSubsequence")(a => subseq(a(0), a(1)))
    // extractGroups (reference src/Functions/extractGroups.cpp): all
    // capture groups of the FIRST match; empty array when no match.
    // Group count is read from the pattern literal.
    q = rewriteCalls(q, "extractGroups") { a =>
      val pat = a(1).trim
      val inner = pat.stripPrefix("'").stripSuffix("'")
      var groups = 0
      var i = 0
      while (i < inner.length) {
        if (inner.charAt(i) == '(' && (i == 0 || inner.charAt(i - 1) != '\\') &&
          (i + 1 >= inner.length || inner.charAt(i + 1) != '?')) groups += 1
        i += 1
      }
      val extracts = (1 to groups)
        .map(g => s"regexp_extract(${a(0)}, $pat, $g)").mkString(", ")
      s"IF(${a(0)} RLIKE $pat, array($extracts), CAST(array() AS ARRAY<STRING>))"
    }
    // arrayShiftLeft/Right (reference src/Functions/array/arrayShift*):
    // length-preserving shift, fill with the given default (typed NULL
    // when omitted — CH fills the type's default value there).
    def typedNull(arr: String): String =
      s"nullif(element_at($arr, 1), element_at($arr, 1))"
    q = rewriteCalls(q, "arrayShiftLeft") { a =>
      val d = if (a.length > 2) a(2) else typedNull(a(0))
      s"concat(slice(${a(0)}, (${a(1)}) + 1, greatest(size(${a(0)}) - (${a(1)}), 0)), " +
        s"array_repeat($d, least(${a(1)}, size(${a(0)}))))"
    }
    q = rewriteCalls(q, "arrayShiftRight") { a =>
      val d = if (a.length > 2) a(2) else typedNull(a(0))
      s"concat(array_repeat($d, least(${a(1)}, size(${a(0)}))), " +
        s"slice(${a(0)}, 1, greatest(size(${a(0)}) - (${a(1)}), 0)))"
    }
    // toDecimalString (reference src/Functions/toDecimalString.cpp):
    // fixed-scale decimal rendering; scale must be a literal.
    q = rewriteCalls(q, "toDecimalString")(a =>
      s"format_string('%.${a(1).trim}f', CAST(${a(0)} AS DOUBLE))")
    // -Distinct combinator (reference AggregateFunctionDistinct.cpp)
    q = rewriteCalls(q, "sumDistinct")(a => s"sum(DISTINCT ${a(0)})")
    q = rewriteCalls(q, "avgDistinct")(a => s"avg(DISTINCT ${a(0)})")
    q = rewriteCalls(q, "countDistinct")(a =>
      s"count(DISTINCT ${a.mkString(", ")})")
    // argMin/argMax with the -If combinator: rows failing the predicate
    // get a NULL ordering value, which min_by/max_by ignore.
    q = rewriteCalls(q, "argMinIf")(a =>
      s"min_by(${a(0)}, CASE WHEN ${a(2)} THEN ${a(1)} END)")
    q = rewriteCalls(q, "argMaxIf")(a =>
      s"max_by(${a(0)}, CASE WHEN ${a(2)} THEN ${a(1)} END)")
    // ---- batch 11 templates ----
    // Modified Julian Day epoch = 1858-11-17 (reference
    // fromModifiedJulianDay.cpp)
    q = rewriteCalls(q, "toModifiedJulianDay")(a =>
      s"datediff(CAST(${a(0)} AS DATE), DATE'1858-11-17')")
    q = rewriteCalls(q, "fromModifiedJulianDay")(a =>
      s"date_add(DATE'1858-11-17', CAST(${a(0)} AS INT))")
    // changeDate family (reference changeDate.cpp): swap one component
    q = rewriteCalls(q, "changeYear")(a =>
      s"make_date(${a(1)}, month(${a(0)}), day(${a(0)}))")
    q = rewriteCalls(q, "changeMonth")(a =>
      s"make_date(year(${a(0)}), ${a(1)}, day(${a(0)}))")
    q = rewriteCalls(q, "changeDay")(a =>
      s"make_date(year(${a(0)}), month(${a(0)}), ${a(1)})")
    q = rewriteCalls(q, "countDigits")(a =>
      s"length(CAST(abs(${a(0)}) AS STRING))")
    // XML entity codec (reference encodeXMLComponent.cpp) — ordered
    // replace chains; decode reverses with &amp; LAST
    q = rewriteCalls(q, "encodeXMLComponent")(a =>
      s"replace(replace(replace(replace(replace(${a(0)}, " +
        "'&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '\"', '&quot;'), \"'\", '&apos;')")
    q = rewriteCalls(q, "decodeXMLComponent")(a =>
      s"replace(replace(replace(replace(replace(${a(0)}, " +
        "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&apos;', \"'\"), '&amp;', '&')")
    // CH base64Decode returns String, Spark unbase64 returns BINARY —
    // without the cast any string function over the result fails
    // analysis (found by the fuzzer: toInt64OrZero(base64Decode(...)))
    q = rewriteCalls(q, "base64Decode")(a =>
      s"base64_decode_strict(${a(0)})")
    // Spark's base64 emits RFC-2045 MIME chunking (CRLF every 76 chars);
    // CH never chunks — strip the breaks (translate with no target chars
    // deletes). The strict decoder rejects embedded whitespace, so
    // unstripped output would fail its own round-trip (02113).
    q = rewriteCalls(q, "base64Encode")(a =>
      "translate(base64(" + a(0) + "), '\\r\\n', '')")
    // URL-safe base64 alphabet (reference base64URLEncode.cpp)
    // the URL-safe variant is UNPADDED (reference base64URLEncode.cpp)
    q = rewriteCalls(q, "base64URLEncode")(a =>
      s"base64url_encode(${a(0)})")
    q = rewriteCalls(q, "base64URLDecode")(a =>
      s"base64url_decode_strict(${a(0)})")
    // bar(x, min, max, width) — full blocks only (the reference also
    // emits eighth-blocks for the fractional tail)
    q = rewriteCalls(q, "bar")(a =>
      s"repeat('█', CAST(greatest((${a(0)} - (${a(1)})) * ${a(3)} " +
        s"/ ((${a(2)}) - (${a(1)})), 0) AS INT))")
    // extractKeyValuePairs (reference extractKeyValuePairs.cpp): CH takes
    // (data[, kvDelim[, pairDelims]]); Spark's str_to_map wants
    // (data, pairDelim, kvDelim) with regex delimiters
    q = rewriteCalls(q, "extractKeyValuePairs") { a =>
      val kv = if (a.length > 1) a(1) else "':'"
      val pair = if (a.length > 2) s"concat('[', ${a(2)}, ']+')" else "'[,;] *'"
      s"str_to_map(${a(0)}, $pair, $kv)"
    }
    // ---- batch 12 templates ----
    // lemmatize/synonyms: CH passes the dictionary/extension name first;
    // our embedded-dictionary kernels take only the word
    q = rewriteCalls(q, "lemmatize")(a =>
      if (a.length == 2) s"lemmatize_dict(${a(1)})" else s"lemmatize_dict(${a(0)})")
    q = rewriteCalls(q, "synonyms")(a =>
      if (a.length == 2) s"synonyms_dict(${a(1)})" else s"synonyms_dict(${a(0)})")
    // detectTonality / detectProgrammingLanguage expand to SQL with the
    // dictionaries rendered inline from the SAME llm.Nlp data the
    // DataFrame kernels use (SQL lambdas resolve natively in the parser)
    q = rewriteCalls(q, "detectTonality")(a => tonalitySqlExpr(a(0)))
    q = rewriteCalls(q, "detectProgrammingLanguage")(a => progLangSqlExpr(a(0)))
    // now64([precision[, tz]]) — session is pinned to UTC microseconds
    q = rewriteCalls(q, "now64")(_ => "current_timestamp()")
    // runningAccumulate(x[, ord]): CH accumulates in block order; a
    // deterministic engine needs an explicit order — 2-arg form takes the
    // ordering column, 1-arg falls back to input order via
    // monotonically_increasing_id (the honest analog of block order)
    q = rewriteCalls(q, "runningAccumulate")(a =>
      if (a.length >= 2)
        s"sum(${a(0)}) OVER (ORDER BY ${a(1)} " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      else
        s"sum(${a(0)}) OVER (ORDER BY monotonically_increasing_id() " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    // firstSignificantSubdomain / cutToFirstSignificantSubdomain
    // (reference src/Functions/URL/): public-suffix logic approximated by
    // the common two-level ccTLD families. The RFC spellings (strict
    // RFC 3986 host parse) canonicalize 1:1 — parse_url is URI-based
    // already. The Custom spellings consult a named TLD list registered
    // via ChSql.registerTldList (reference: top_level_domains_lists
    // server config), falling back to the default logic when the listed
    // suffixes don't match.
    def fssBody(x: String): String =
      s"regexp_extract(parse_url($x, 'HOST'), " +
        "'([^.]+)\\\\.(?:(?:com|net|org|co|gov|edu|ac)\\\\.[a-z]{2}|[^.]+)$$', 1)"
    def cutFssBody(x: String): String =
      s"regexp_extract(parse_url($x, 'HOST'), " +
        "'([^.]+\\\\.(?:(?:com|net|org|co|gov|edu|ac)\\\\.[a-z]{2}|[^.]+))$$', 1)"
    def customAlt(listName: String): String =
      tldLists.getOrElse(listName.replaceAll("'", "").trim, Seq.empty)
        .map(_.replace(".", "\\\\.")).mkString("|")
    for (n <- Seq("firstSignificantSubdomainCustomRFC", "firstSignificantSubdomainCustom"))
      q = rewriteCalls(q, n) { a =>
        val alt = customAlt(a(1))
        if (alt.isEmpty) fssBody(a(0))
        else s"coalesce(nullif(regexp_extract(parse_url(${a(0)}, 'HOST'), " +
          s"'([^.]+)\\\\.(?:$alt)$$', 1), ''), ${fssBody(a(0))})"
      }
    for (n <- Seq("cutToFirstSignificantSubdomainCustomWithWWWRFC",
        "cutToFirstSignificantSubdomainCustomWithWWW"))
      q = rewriteCalls(q, n) { a =>
        val alt = customAlt(a(1))
        val core = if (alt.isEmpty) cutFssBody(a(0))
          else s"coalesce(nullif(regexp_extract(parse_url(${a(0)}, 'HOST'), " +
            s"'([^.]+\\\\.(?:$alt))$$', 1), ''), ${cutFssBody(a(0))})"
        s"concat(CASE WHEN parse_url(${a(0)}, 'HOST') LIKE 'www.%' " +
          s"THEN 'www.' ELSE '' END, $core)"
      }
    for (n <- Seq("cutToFirstSignificantSubdomainCustomRFC",
        "cutToFirstSignificantSubdomainCustom"))
      q = rewriteCalls(q, n) { a =>
        val alt = customAlt(a(1))
        if (alt.isEmpty) cutFssBody(a(0))
        else s"coalesce(nullif(regexp_extract(parse_url(${a(0)}, 'HOST'), " +
          s"'([^.]+\\\\.(?:$alt))$$', 1), ''), ${cutFssBody(a(0))})"
      }
    for (n <- Seq("cutToFirstSignificantSubdomainWithWWWRFC",
        "cutToFirstSignificantSubdomainWithWWW"))
      q = rewriteCalls(q, n)(a =>
        s"concat(CASE WHEN parse_url(${a(0)}, 'HOST') LIKE 'www.%' " +
          s"THEN 'www.' ELSE '' END, ${cutFssBody(a(0))})")
    q = rewriteCalls(q, "cutToFirstSignificantSubdomainRFC")(a => cutFssBody(a(0)))
    q = rewriteCalls(q, "cutToFirstSignificantSubdomain")(a => cutFssBody(a(0)))
    q = rewriteCalls(q, "firstSignificantSubdomainRFC")(a => fssBody(a(0)))
    q = rewriteCalls(q, "firstSignificantSubdomain")(a => fssBody(a(0)))
    // ---- round-10 batch 22: server/context constants + introspection ----
    // (reference src/Functions/serverConstants.cpp and friends): rendered
    // as literals at rewrite time — one engine, one shard, stable values.
    for (n <- Seq("hostName", "hostname", "displayName"))
      q = rewriteCalls(q, n)(_ =>
        s"'${java.net.InetAddress.getLocalHost.getHostName}'")
    for (n <- Seq("FQDN", "fullHostName"))
      q = rewriteCalls(q, n)(_ =>
        s"'${java.net.InetAddress.getLocalHost.getCanonicalHostName}'")
    q = rewriteCalls(q, "uptime")(_ =>
      s"CAST(${java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1000} AS BIGINT)")
    // one id per query — a fresh UUID at rewrite time IS the contract
    for (n <- Seq("queryID", "currentQueryID", "query_id",
        "initialQueryID", "initial_query_id"))
      q = rewriteCalls(q, n)(_ => s"'${java.util.UUID.randomUUID()}'")
    q = rewriteCalls(q, "tcpPort")(_ => "CAST(9000 AS INT)") // reference default port
    q = rewriteCalls(q, "shardNum")(_ => "CAST(1 AS INT)")
    q = rewriteCalls(q, "shardCount")(_ => "CAST(1 AS INT)")
    q = rewriteCalls(q, "serverUUID")(_ => s"'$serverUuid'")
    for (n <- Seq("connectionId", "connection_id"))
      q = rewriteCalls(q, n)(_ => "CAST(0 AS BIGINT)")
    for (n <- Seq("DATABASE", "SCHEMA"))
      q = rewriteCalls(q, n)(_ => "current_database()")
    q = rewriteCalls(q, "currentSchemas")(_ => "array(current_database())")
    q = rewriteCalls(q, "user")(_ => "current_user()")
    // block introspection: a "block" maps to the Spark partition
    q = rewriteCalls(q, "blockNumber")(_ => "CAST(spark_partition_id() AS BIGINT)")
    q = rewriteCalls(q, "rowNumberInAllBlocks")(_ =>
      "(row_number() OVER (ORDER BY monotonically_increasing_id()) - 1)")
    q = rewriteCalls(q, "rowNumberInBlock")(_ =>
      "(row_number() OVER (PARTITION BY spark_partition_id() " +
        "ORDER BY monotonically_increasing_id()) - 1)")
    q = rewriteCalls(q, "blockSize")(_ =>
      "count(*) OVER (PARTITION BY spark_partition_id())")
    q = rewriteCalls(q, "visibleWidth")(a => s"length(CAST(${a(0)} AS STRING))")
    q = rewriteCalls(q, "byteSize")(a =>
      a.map(x => s"byte_size($x)").mkString("(", " + ", ")"))
    q = rewriteCalls(q, "throwIf")(a =>
      if (a.length >= 2)
        s"(CASE WHEN ${a(0)} THEN CAST(raise_error(${a(1)}) AS INT) ELSE 0 END)"
      else s"(CASE WHEN ${a(0)} THEN CAST(raise_error('throwIf condition met') AS INT) ELSE 0 END)")
    q = rewriteCalls(q, "indexHint")(_ => "1")
    q = rewriteCalls(q, "isNullable")(a => s"is_nullable_col(${a(0)})")
    q = rewriteCalls(q, "isConstant")(a => s"is_constant_col(${a(0)})")
    q = rewriteCalls(q, "defaultValueOfArgumentType")(a =>
      s"default_value_of_arg(${a(0)})")
    q = rewriteCalls(q, "defaultValueOfTypeName") { a =>
      a(0).replaceAll("'", "").trim match {
        case "Int8" => "CAST(0 AS TINYINT)"
        case "Int16" => "SMALLINT '0'"
        case "Int32" => "CAST(0 AS INT)"
        case "Int64" => "CAST(0 AS BIGINT)"
        case t if t.startsWith("UInt") => "CAST(0 AS BIGINT)"
        case "Float32" => "CAST(0 AS FLOAT)"
        case "Float64" => "CAST(0 AS DOUBLE)"
        case "String" => "''"
        case "Date" | "Date32" => "DATE'1970-01-01'"
        case "DateTime" => "TIMESTAMP'1970-01-01 00:00:00'"
        case t if t.startsWith("Nullable") => "NULL"
        case other => s"raise_error('defaultValueOfTypeName: unmapped $other')"
      }
    }
    q = rewriteCalls(q, "toColumnTypeName")(a => s"typeof(${a(0)})")
    q = rewriteCalls(q, "dumpColumnStructure")(a => s"typeof(${a(0)})")
    // round-10 batch 26: JSON path introspection (content-derived),
    // subcolumn access, query-start time, and file() (reads the file at
    // rewrite time into a literal — the reference reads server-side
    // user_files the same way, at query compile)
    q = rewriteCalls(q, "JSONAllPathsWithTypes")(a =>
      s"json_all_paths_with_types(${a(0)})")
    q = rewriteCalls(q, "JSONAllPaths")(a => s"json_all_paths(${a(0)})")
    q = rewriteCalls(q, "getSubcolumn")(a =>
      s"(${a(0)}).${a(1).replaceAll("'", "").trim}")
    for (n <- Seq("initialQueryStartTime", "initial_query_start_time",
        "queryStartTime"))
      q = rewriteCalls(q, n)(_ => "current_timestamp()")
    q = rewriteCalls(q, "file") { a =>
      val path = a(0).replaceAll("'", "").trim
      val content = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      "'" + content.replace("'", "''") + "'"
    }
    // ---- round-10 batch 27: URL path tail, IPv6 CIDR, functional IN ----
    q = rewriteCalls(q, "pathFull")(a =>
      s"concat(parse_url(${a(0)}, 'PATH'), " +
        s"coalesce(concat('?', parse_url(${a(0)}, 'QUERY')), ''))")
    q = rewriteCalls(q, "path")(a => s"parse_url(${a(0)}, 'PATH')")
    q = rewriteCalls(q, "basename")(a =>
      s"element_at(split(${a(0)}, '[/\\\\\\\\]'), -1)")
    // IPv4NumToStringClassC: last octet rendered as 'xxx'
    q = rewriteCalls(q, "IPv4NumToStringClassC")(a =>
      s"concat_ws('.', CAST((shiftright(${a(0)}, 24)) & 255 AS STRING), " +
        s"CAST((shiftright(${a(0)}, 16)) & 255 AS STRING), " +
        s"CAST((shiftright(${a(0)}, 8)) & 255 AS STRING), 'xxx')")
    // cutIPv6(addr, bytesToCutForIPv6, bytesToCutForIPv4): zero the
    // trailing bytes (v4-mapped addresses — canonical form contains a
    // dot — use the v4 cut count)
    q = rewriteCalls(q, "cutIPv6") { a =>
      def cut(n: String) =
        s"ipv6_num_to_string(concat(CAST(substring(ipv6_string_to_num(${a(0)}), " +
          s"1, 16 - ($n)) AS BINARY), unhex(repeat('00', $n))))"
      s"(CASE WHEN contains(ipv6_num_to_string(ipv6_string_to_num(${a(0)})), '.') " +
        s"THEN ${cut(a(2))} ELSE ${cut(a(1))} END)"
    }
    q = rewriteCalls(q, "IPv6CIDRToRange")(a =>
      s"ipv6_cidr_to_range(${a(0)}, ${a(1)})")
    // functional IN family (FunctionsComparison/inFunctions): the
    // 2-arg form with a tuple right side is the CH function; when the
    // right side is not a tuple the match is the infix keyword written
    // without a space — re-emit it untouched. IgnoreSet spellings are
    // the analyzer's internal set-reuse variants — same semantics.
    def tupleItems(arg: String): Option[Seq[String]] = {
      val t = arg.trim
      if (t.startsWith("(") && t.endsWith(")"))
        Some(splitArgs(t.stripPrefix("(").stripSuffix(")")))
      else if (t.startsWith("tuple(") && t.endsWith(")"))
        Some(splitArgs(t.stripPrefix("tuple(").stripSuffix(")")))
      else None
    }
    for (n <- Seq("globalInIgnoreSet", "globalIn", "inIgnoreSet", "in"))
      q = rewriteCalls(q, n)(a =>
        if (a.length == 2 && tupleItems(a(1)).isDefined)
          s"(${a(0)} IN (${tupleItems(a(1)).get.mkString(", ")}))"
        else s"$n (${a.mkString(", ")})")
    for (n <- Seq("globalNotInIgnoreSet", "globalNotIn", "notInIgnoreSet", "notIn"))
      q = rewriteCalls(q, n)(a =>
        if (a.length == 2 && tupleItems(a(1)).isDefined)
          s"(${a(0)} NOT IN (${tupleItems(a(1)).get.mkString(", ")}))"
        else s"$n (${a.mkString(", ")})")
    // nullIn: transform_null_in semantics — NULL compares equal to NULL
    for (n <- Seq("globalNullInIgnoreSet", "globalNullIn", "nullInIgnoreSet", "nullIn"))
      q = rewriteCalls(q, n)(a =>
        tupleItems(a(1)) match {
          case Some(items) =>
            "(" + items.map(e => s"${a(0)} <=> $e").mkString(" OR ") + ")"
          case None => s"$n (${a.mkString(", ")})"
        })
    for (n <- Seq("globalNotNullInIgnoreSet", "globalNotNullIn",
        "notNullInIgnoreSet", "notNullIn"))
      q = rewriteCalls(q, n)(a =>
        tupleItems(a(1)) match {
          case Some(items) =>
            "(NOT (" + items.map(e => s"${a(0)} <=> $e").mkString(" OR ") + "))"
          case None => s"$n (${a.mkString(", ")})"
        })
    // partitionId: the reference formats the partition-key values into
    // the part-name id — rendered as the '-'-joined value list here
    for (n <- Seq("partitionID", "partitionId"))
      q = rewriteCalls(q, n)(a =>
        s"concat_ws('-', ${a.map(x =>
          // Date values render as YYYYMMDD in part ids (MergeTreePartition
          // ::getID), everything else as its plain text
          s"(CASE WHEN CAST($x AS STRING) RLIKE '^[0-9]{4}-[0-9]{2}-[0-9]{2}$$' " +
            s"THEN replace(CAST($x AS STRING), '-', '') " +
            s"ELSE CAST($x AS STRING) END)").mkString(", ")})")
    // hasColumnInTable([host,] db, table, col): resolved at rewrite time
    // against the declared fixture schemas
    q = rewriteCalls(q, "hasColumnInTable") { a =>
      val table = a(a.length - 2).replaceAll("'", "").trim
      val col = a.last.replaceAll("'", "").trim
      graft.core.Tables.hasColumn(table, col) match {
        case Some(b) => b.toString
        case None => s"raise_error('hasColumnInTable: unknown table $table')"
      }
    }
    q = rewriteCalls(q, "isIPAddressInRange")(a =>
      s"is_ip_in_range(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "parseTimeDelta")(a => s"parse_time_delta(${a(0)})")
    q = rewriteCalls(q, "isDecimalOverflow")(a =>
      s"is_decimal_overflow(${a.mkString(", ")})")
    // runningDifference family (deprecated in the reference; row order =
    // processing order there, a global monotonic order here)
    q = rewriteCalls(q, "runningDifferenceStartingWithFirstValue")(a =>
      s"coalesce(${a(0)} - lag(${a(0)}, 1) OVER " +
        s"(ORDER BY monotonically_increasing_id()), ${a(0)})")
    q = rewriteCalls(q, "runningDifference")(a =>
      s"coalesce(${a(0)} - lag(${a(0)}, 1) OVER " +
        s"(ORDER BY monotonically_increasing_id()), 0)")
    // keyed SipHash: sipHash64Keyed((k0, k1), data)
    def sipKeyed(fn: String)(a: Seq[String]): String = {
      val inner = a(0).trim.stripPrefix("tuple(").stripPrefix("struct(")
        .stripPrefix("(").stripSuffix(")")
      val ks = splitArgs(inner)
      s"$fn(${ks(0)}, ${ks(1)}, ${a(1)})"
    }
    q = rewriteCalls(q, "sipHash64Keyed")(sipKeyed("ch_siphash64_keyed"))
    q = rewriteCalls(q, "sipHash128ReferenceKeyed")(sipKeyed("ch_siphash128_reference_keyed"))
    q = rewriteCalls(q, "sipHash128Keyed")(sipKeyed("ch_siphash128_keyed"))
    // timestamp(date[, time]): DateTime64 construction
    q = rewriteCalls(q, "timestamp")(a =>
      if (a.length >= 2)
        s"timestampadd(SECOND, CAST(unix_timestamp(CAST(concat('1970-01-01 ', " +
          s"${a(1)}) AS TIMESTAMP)) AS BIGINT), CAST(${a(0)} AS TIMESTAMP))"
      else s"CAST(${a(0)} AS TIMESTAMP)")
    // ---- round-10 batch 23: URLHash + random tail ----
    // URLHash (FunctionsHashing.h URLHashImpl): cityHash64 of the URL
    // with ONE trailing '/', '?' or '#' dropped; the 2-arg form hashes
    // the level-N hierarchy prefix (URLHierarchy expands later in this
    // pass, so emitting its name here still resolves)
    q = rewriteCalls(q, "URLHash")(a =>
      if (a.length >= 2)
        s"ch_cityhash64(regexp_replace(element_at(URLHierarchy(${a(0)}), " +
          s"CAST(${a(1)} AS INT) + 1), '[/?#]$$', ''))"
      else s"ch_cityhash64(regexp_replace(${a(0)}, '[/?#]$$', ''))")
    q = rewriteCalls(q, "rand32")(_ => "CAST(RAND() * 4294967296 AS BIGINT)")
    // randConstant: one random value shared by every row of the query —
    // a rewrite-time literal IS that contract
    q = rewriteCalls(q, "randConstant")(_ =>
      s"CAST(${(scala.util.Random.nextDouble() * 4294967296L).toLong}L AS BIGINT)")
    // randomFixedString(n): n random bytes (Binary here; FixedString
    // there). Bytes repeat past 16 per row — documented rand() seed width.
    q = rewriteCalls(q, "randomFixedString")(a =>
      s"unhex(substring(repeat(md5(CAST(rand() AS STRING)), " +
        s"CAST(ceil((${a(0)}) / 16.0) AS INT)), 1, 2 * (${a(0)})))")
    // randomStringUTF8(n): printable-ASCII approximation of the
    // reference's random code points (documented)
    q = rewriteCalls(q, "randomStringUTF8")(a =>
      s"concat_ws('', transform(sequence(1, CAST(${a(0)} AS INT)), " +
        s"__i -> char(CAST(rand() * 94 + 33 AS INT))))")
    // dictGet / dictGetOrDefault (reference
    // FunctionsExternalDictionaries.h): the CH-arity 3-arg form
    // dictGet('dict', 'attr', key) works for dictionaries declared with
    // CREATE DICTIONARY ... PRIMARY KEY k SOURCE(... TABLE ') (key column
    // from the registry); the 4-arg form names the key column explicitly.
    // Both render as a scalar subquery, which Catalyst rewrites into a
    // (broadcastable) left outer join
    def dictLookupSql(a: Seq[String], defaultExpr: Option[String]): String = {
      val (table, attr, keyCol, keyExpr) =
        if (a.length == 3) {
          val name = stripName(a(0))
          val (t, k) = registeredDicts.getOrElse(name,
            throw new IllegalArgumentException(
              s"dictGet: no CREATE DICTIONARY named '$name' " +
                "(or pass the key column explicitly as the 3rd argument)"))
          (t, stripName(a(1)), k, a(2))
        } else (stripName(a(0)), stripName(a(1)), stripName(a(2)), a(3))
      val sub = s"(SELECT $attr FROM $table WHERE $keyCol = $keyExpr)"
      defaultExpr.map(d => s"coalesce($sub, $d)").getOrElse(sub)
    }
    q = rewriteCalls(q, "dictGet")(a => dictLookupSql(a, None))
    q = rewriteCalls(q, "dictGetOrDefault")(a =>
      dictLookupSql(a.dropRight(1), Some(a.last)))
    // round-10 batch 24: the typed dictGet* spellings (reference
    // FunctionsExternalDictionaries.h registers one per attribute type)
    // — the untyped lookup plus a cast; OrDefault adds the caller
    // fallback; dictGetOrNull is the bare lookup (NULL on miss);
    // dictHas probes key presence on the registered source table
    for ((chT, sqlT) <- Seq("String" -> "STRING", "Int8" -> "TINYINT",
        "Int16" -> "SMALLINT", "Int32" -> "INT", "Int64" -> "BIGINT",
        "UInt8" -> "BIGINT", "UInt16" -> "BIGINT", "UInt32" -> "BIGINT",
        "UInt64" -> "BIGINT", "Float32" -> "FLOAT", "Float64" -> "DOUBLE",
        "Date" -> "DATE", "DateTime" -> "TIMESTAMP", "UUID" -> "STRING",
        "IPv4" -> "STRING", "IPv6" -> "STRING")) {
      q = rewriteCalls(q, s"dictGet${chT}OrDefault")(a =>
        s"coalesce(CAST(${dictLookupSql(a.dropRight(1), None)} AS $sqlT), ${a.last})")
      q = rewriteCalls(q, s"dictGet$chT")(a =>
        s"CAST(${dictLookupSql(a, None)} AS $sqlT)")
    }
    q = rewriteCalls(q, "dictGetOrNull")(a => dictLookupSql(a, None))
    // round-10 batch 28: HIERARCHICAL dictionaries (reference
    // FunctionsExternalDictionaries.h dictGetHierarchy/dictIsIn/
    // dictGetChildren/dictGetDescendants over the parent column declared
    // HIERARCHICAL in the DDL). The parent chain unrolls to a fixed
    // depth (8 up, 4 down) — each level is a scalar subquery Catalyst
    // turns into a broadcastable join; parent 0 terminates (the
    // reference's null_value convention for roots).
    def hierDict(arg: String): (String, String, String) = {
      val name = stripName(arg)
      val (t, k) = registeredDicts.getOrElse(name,
        throw new IllegalArgumentException(
          s"hierarchical dictGet: no CREATE DICTIONARY named '$name'"))
      val p = dictParents.getOrElse(name,
        throw new IllegalArgumentException(
          s"dictionary '$name' has no HIERARCHICAL attribute"))
      (t, k, p)
    }
    def hierChain(arg0: String, key: String): Seq[String] = {
      val (t, k, p) = hierDict(arg0)
      // each level is ONE flat self-join subquery: Catalyst only resolves
      // outer references one subquery level deep, so the chain must not
      // nest the key inside deeper and deeper subqueries
      def level(n: Int): String = {
        val joins = (2 to n).map(i =>
          s"JOIN $t __h$i ON __h$i.$k = nullif(__h${i - 1}.$p, 0)").mkString(" ")
        s"(SELECT nullif(__h$n.$p, 0) FROM $t __h1 $joins WHERE __h1.$k = ($key))"
      }
      s"($key)" +: (1 to 8).map(level)
    }
    // array_compact, not filter(): Spark rejects subqueries inside
    // higher-order functions
    q = rewriteCalls(q, "dictGetHierarchy")(a =>
      s"array_compact(array(${hierChain(a(0), a(1)).mkString(", ")}))")
    q = rewriteCalls(q, "dictIsIn")(a =>
      s"array_contains(array_compact(array(${hierChain(a(0), a(1)).mkString(", ")})), ${a(2)})")
    q = rewriteCalls(q, "dictGetChildren") { a =>
      val (t, k, p) = hierDict(a(0))
      s"(SELECT sort_array(collect_list($k)) FROM $t WHERE $p = ${a(1)})"
    }
    q = rewriteCalls(q, "dictGetDescendants") { a =>
      val (t, k, p) = hierDict(a(0))
      val maxLevels =
        if (a.length >= 3 && a(2).trim.matches("\\d+") && a(2).trim.toInt > 0)
          math.min(a(2).trim.toInt, 4)
        else 4
      var prev = s"(SELECT sort_array(collect_list($k)) FROM $t WHERE $p = ${a(1)})"
      val levels = scala.collection.mutable.Buffer(prev)
      for (_ <- 2 to maxLevels) {
        prev = s"(SELECT sort_array(collect_list($k)) FROM $t " +
          s"WHERE array_contains($prev, $p))"
        levels += prev
      }
      s"flatten(array(${levels.mkString(", ")}))"
    }
    q = rewriteCalls(q, "dictHas") { a =>
      val name = stripName(a(0))
      val (t, k) = registeredDicts.getOrElse(name,
        throw new IllegalArgumentException(
          s"dictHas: no CREATE DICTIONARY named '$name'"))
      s"((SELECT count(1) FROM $t WHERE $k = ${a(1)}) > 0)"
    }
    // geometry text renderers (reference src/Functions/wkt.cpp, svg.cpp):
    // polygons here are array<struct<x,y>> (SURVEY §1.2 geo mapping)
    q = rewriteCalls(q, "wkt")(a =>
      s"concat('POLYGON((', array_join(transform(${a(0)}, " +
        "__p -> concat(cast(__p.x AS STRING), ' ', cast(__p.y AS STRING))), ', '), '))')")
    q = rewriteCalls(q, "svg")(a =>
      s"""concat('<polygon points="', array_join(transform(${a(0)}, """ +
        """__p -> concat(cast(__p.x AS STRING), ',', cast(__p.y AS STRING))), ' '), '"/>')""")
    q = rewriteCalls(q, "readWKTPolygon")(a =>
      s"transform(split(regexp_extract(${a(0)}, '^POLYGON\\\\(\\\\((.*)\\\\)\\\\)$$', 1), ', '), " +
        "__s -> named_struct('x', cast(element_at(split(__s, ' '), 1) AS DOUBLE), " +
        "'y', cast(element_at(split(__s, ' '), 2) AS DOUBLE)))")
    // ---- batch 13 templates ----
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD"))
      q = rewriteCalls(q, s"normalizeUTF8$form")(a =>
        s"normalize_utf8(${a(0)}, '$form')")
    q = rewriteCalls(q, "makeDateTime")(a =>
      s"make_timestamp(${a.take(6).mkString(", ")})")
    q = rewriteCalls(q, "makeDateTime64")(a =>
      s"make_timestamp(${a.take(6).mkString(", ")})")
    // parseDateTime: MySQL-style format (reference parseDateTime.cpp) —
    // literal formats translate token-by-token to Spark patterns
    def mysqlFmt(f: String): String = f
      .replace("%Y", "yyyy").replace("%y", "yy").replace("%m", "MM")
      .replace("%d", "dd").replace("%H", "HH").replace("%i", "mm")
      .replace("%s", "ss").replace("%S", "ss").replace("%M", "MMMM")
      .replace("%e", "d").replace("%j", "DDD").replace("%T", "HH:mm:ss")
      .replace("%F", "yyyy-MM-dd").replace("%R", "HH:mm")
    q = rewriteCalls(q, "parseDateTime")(a =>
      if (a.length >= 2) s"to_timestamp(${a(0)}, '${mysqlFmt(stripName(a(1)))}')"
      else s"to_timestamp(${a(0)})")
    // formatDateTime also takes the MySQL-style format (reference
    // src/Functions/formatDateTime.cpp) — a bare alias to date_format
    // would pass '%Y-%m-%d' through as a literal Java pattern. Literal
    // formats convert token-by-token; non-literal formats pass through
    // (found while building the timestamp fuzz mode).
    q = rewriteCalls(q, "formatDateTime")(a =>
      if (a.length >= 2 && a(1).trim.startsWith("'"))
        s"date_format(${a(0)}, '${mysqlFmt(stripName(a(1)))}')"
      else if (a.length >= 2) s"date_format(${a(0)}, ${a(1)})"
      else s"date_format(${a(0)}, 'yyyy-MM-dd HH:mm:ss')")
    q = rewriteCalls(q, "parseDateTimeInJodaSyntax")(a =>
      if (a.length >= 2) s"to_timestamp(${a(0)}, ${a(1)})" else s"to_timestamp(${a(0)})")
    q = rewriteCalls(q, "formatDateTimeInJodaSyntax")(a =>
      s"date_format(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "YYYYMMDDhhmmssToDateTime")(a =>
      s"to_timestamp(lpad(cast(cast(${a(0)} AS BIGINT) AS STRING), 14, '0'), 'yyyyMMddHHmmss')")
    q = rewriteCalls(q, "UTCTimestamp")(_ => "current_timestamp()")
    // hasSubstr(haystack, needle): contiguous subsequence of an array
    q = rewriteCalls(q, "hasSubstr")(a =>
      s"(size(${a(1)}) = 0 OR exists(sequence(1, greatest(size(${a(0)}) - size(${a(1)}) + 1, 0)), " +
        s"__i -> slice(${a(0)}, __i, size(${a(1)})) = ${a(1)}))")
    // ngrams(s, n): character n-grams (reference src/Functions/ngrams.cpp)
    q = rewriteCalls(q, "ngrams")(a =>
      s"transform(sequence(1, greatest(length(${a(0)}) - ${a(1)} + 1, 0)), " +
        s"__i -> substring(${a(0)}, __i, ${a(1)}))")
    // CH array HOFs take the lambda FIRST
    q = rewriteCalls(q, "arrayFirstOrNull")(a =>
      s"try_element_at(filter(${a(1)}, ${a(0)}), 1)")
    q = rewriteCalls(q, "arrayLastOrNull")(a =>
      s"try_element_at(filter(${a(1)}, ${a(0)}), -1)")
    q = rewriteCalls(q, "arrayRandomSample")(a =>
      s"slice(shuffle(${a(0)}), 1, ${a(1)})")
    // running (prefix) sums (reference arrayCumSum in arrayCumSum.cpp);
    // emitted as BIGINT — integer-array semantics (CH widens ints to
    // (U)Int64; float arrays would need a typed zero a text template
    // can't produce). Optional leading lambda like the reference.
    q = rewriteCalls(q, "arrayCumSum")(a => {
      val arr = if (a.length == 2) s"transform(${a(1)}, ${a(0)})" else a(0)
      s"aggregate($arr, named_struct('a', CAST(array() AS ARRAY<BIGINT>)," +
        " 's', CAST(0 AS BIGINT)), (__ac, __v) -> named_struct(" +
        "'a', concat(__ac.a, array(__ac.s + __v)), " +
        "'s', __ac.s + __v), __ac -> __ac.a)"
    })
    // running sum that clamps negative partials to 0 (reference
    // arrayCumSumNonNegative.cpp); emitted as BIGINT
    q = rewriteCalls(q, "arrayCumSumNonNegative")(a =>
      s"aggregate(${a(0)}, named_struct('a', CAST(array() AS ARRAY<BIGINT>)," +
        " 's', CAST(0 AS BIGINT)), (__ac, __v) -> named_struct(" +
        "'a', concat(__ac.a, array(greatest(__ac.s + __v, CAST(0 AS BIGINT)))), " +
        "'s', greatest(__ac.s + __v, CAST(0 AS BIGINT))), __ac -> __ac.a)")
    // arrayFill(f, arr): forward-fill — where f(x) is false, carry the
    // last element for which f held (the first element always stays).
    // f is applied to a scalar via size(filter(array(v), f)) = 1 (the
    // dialect's lambdas are SQL text, so there is no direct apply);
    // slice(arr, 1, 0) is the []-of-the-right-type literal.
    // (reverse form first: it emits arrayFill(...), which the arrayFill
    // pass below then expands — rewrites run in source order)
    q = rewriteCalls(q, "arrayReverseFill")(a =>
      s"reverse(arrayFill(${a(0)}, reverse(${a(1)})))")
    q = rewriteCalls(q, "arrayFill")(a =>
      s"aggregate(${a(1)}, named_struct('o', slice(${a(1)}, 1, 0), 'p', try_element_at(${a(1)}, 1)), " +
        s"(__ac, __v) -> named_struct(" +
        s"'o', concat(__ac.o, array(CASE WHEN size(filter(array(__v), ${a(0)})) = 1 " +
        s"OR size(__ac.o) = 0 THEN __v ELSE __ac.p END)), " +
        s"'p', CASE WHEN size(filter(array(__v), ${a(0)})) = 1 OR size(__ac.o) = 0 " +
        s"THEN __v ELSE __ac.p END), __ac -> __ac.o)")
    q = rewriteCalls(q, "mapContainsValue")(a =>
      s"array_contains(map_values(${a(0)}), ${a(1)})")
    q = rewriteCalls(q, "mapSort")(a =>
      s"map_from_entries(array_sort(map_entries(${a(0)})))")
    q = rewriteCalls(q, "mapReverseSort")(a =>
      s"map_from_entries(reverse(array_sort(map_entries(${a(0)}))))")
    q = rewriteCalls(q, "mapExtractKeyLike")(a =>
      s"map_filter(${a(0)}, (__k, __v) -> __k LIKE ${a(1)})")
    // IPv4CIDRToRange(num, prefix) -> numeric (lower, upper) bounds.
    // The shifted 1 must be BIGINT: int shiftleft is mod-32, so prefix 0
    // (1 << 32) would collapse the range to (num, num) instead of the
    // full address space (round-7 advice).
    q = rewriteCalls(q, "IPv4CIDRToRange")(a =>
      s"named_struct('lower', ${a(0)} & (4294967295 - (shiftleft(CAST(1 AS BIGINT), 32 - ${a(1)}) - 1)), " +
        s"'upper', ${a(0)} | (shiftleft(CAST(1 AS BIGINT), 32 - ${a(1)}) - 1))")
    q = rewriteCalls(q, "MACStringToNum")(a =>
      s"CAST(conv(replace(${a(0)}, ':', ''), 16, 10) AS BIGINT)")
    q = rewriteCalls(q, "MACNumToString")(a =>
      s"lower(regexp_replace(lpad(hex(${a(0)}), 12, '0'), '(..)(?!$$)', '$$1:'))")
    q = rewriteCalls(q, "MACStringToOUI")(a =>
      s"CAST(conv(substring(replace(${a(0)}, ':', ''), 1, 6), 16, 10) AS BIGINT)")
    q = rewriteCalls(q, "cutURLParameter")(a =>
      s"regexp_replace(regexp_replace(${a(0)}, " +
        s"concat('([?&])', ${a(1)}, '=[^&#]*&'), '$$1'), " +
        s"concat('[?&]', ${a(1)}, '=[^&#]*'), '')")
    q = rewriteCalls(q, "extractURLParameterNames")(a =>
      s"regexp_extract_all(coalesce(parse_url(${a(0)}, 'QUERY'), ''), '([^=&]+)=', 1)")
    q = rewriteCalls(q, "intDivOrNull")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN NULL ELSE (${a(0)}) div (${a(1)}) END)")
    q = rewriteCalls(q, "modOrNull")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN NULL ELSE (${a(0)}) % (${a(1)}) END)")
    q = rewriteCalls(q, "divideOrNull")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN NULL ELSE (${a(0)}) / (${a(1)}) END)")
    q = rewriteCalls(q, "multiplyDecimal")(a =>
      s"CAST((${a(0)}) * (${a(1)}) AS DECIMAL(38, ${if (a.length > 2) a(2) else "0"}))")
    q = rewriteCalls(q, "divideDecimal")(a =>
      s"CAST((${a(0)}) / (${a(1)}) AS DECIMAL(38, ${if (a.length > 2) a(2) else "0"}))")
    // random strings (no-oracle by design, like rand*): printable ASCII
    q = rewriteCalls(q, "randomPrintableASCII")(a =>
      s"array_join(transform(sequence(1, ${a(0)}), __i -> char(32 + CAST(rand() * 95 AS INT))), '')")
    q = rewriteCalls(q, "randomString")(a =>
      s"array_join(transform(sequence(1, ${a(0)}), __i -> char(32 + CAST(rand() * 95 AS INT))), '')")
    // ---- batch 14 templates ----
    // great-circle (haversine, Earth radius 6371000 m — reference
    // greatCircleDistance.cpp) and the central angle in degrees
    def haversineSql(lon1: String, lat1: String, lon2: String, lat2: String): String = {
      def rad(x: String) = s"radians($x)"
      s"(2 * asin(sqrt(pow(sin((${rad(lat2)} - ${rad(lat1)}) / 2), 2) + " +
        s"cos(${rad(lat1)}) * cos(${rad(lat2)}) * " +
        s"pow(sin((${rad(lon2)} - ${rad(lon1)}) / 2), 2))))"
    }
    for (n <- Seq("greatCircleDistance", "geoDistance"))
      q = rewriteCalls(q, n)(a =>
        s"(6371000.0 * ${haversineSql(a(0), a(1), a(2), a(3))})")
    q = rewriteCalls(q, "greatCircleAngle")(a =>
      s"degrees(${haversineSql(a(0), a(1), a(2), a(3))})")
    // pointInEllipses(x, y, cx1, cy1, a1, b1, ...): inside ANY ellipse
    q = rewriteCalls(q, "pointInEllipses") { a =>
      val checks = a.drop(2).grouped(4).collect { case Seq(cx, cy, ea, eb) =>
        s"(pow((${a(0)} - ($cx)) / ($ea), 2) + pow((${a(1)} - ($cy)) / ($eb), 2) <= 1.0)"
      }.toSeq
      checks.mkString("(", " OR ", ")")
    }
    q = rewriteCalls(q, "bitmaskToArray")(a =>
      s"filter(transform(sequence(0, 63), __i -> shiftleft(CAST(1 AS BIGINT), __i)), " +
        s"__m -> (CAST(${a(0)} AS BIGINT) & __m) != 0)")
    q = rewriteCalls(q, "bitPositionsToArray")(a =>
      s"filter(sequence(0, 63), __i -> (shiftrightunsigned(CAST(${a(0)} AS BIGINT), __i) & 1) = 1)")
    q = rewriteCalls(q, "bitmaskToList")(a =>
      s"array_join(filter(transform(sequence(0, 63), __i -> shiftleft(CAST(1 AS BIGINT), __i)), " +
        s"__m -> (CAST(${a(0)} AS BIGINT) & __m) != 0), ',')")
    // proportionsZTest(successes1, successes2, trials1, trials2[, conf]):
    // pooled two-proportion z and the two-sided p-value via the erfc
    // kernel (the reference also returns a CI, which needs the inverse
    // normal — out of scope, documented)
    q = rewriteCalls(q, "proportionsZTest")(a =>
      s"named_struct('z_stat', " +
        s"((${a(0)}) / (${a(2)}) - (${a(1)}) / (${a(3)})) / " +
        s"sqrt(((${a(0)} + ${a(1)}) / (${a(2)} + ${a(3)})) * " +
        s"(1.0 - (${a(0)} + ${a(1)}) / (${a(2)} + ${a(3)})) * " +
        s"(1.0 / (${a(2)}) + 1.0 / (${a(3)}))), " +
        s"'p_value', erfc(abs(((${a(0)}) / (${a(2)}) - (${a(1)}) / (${a(3)})) / " +
        s"sqrt(((${a(0)} + ${a(1)}) / (${a(2)} + ${a(3)})) * " +
        s"(1.0 - (${a(0)} + ${a(1)}) / (${a(2)} + ${a(3)})) * " +
        s"(1.0 / (${a(2)}) + 1.0 / (${a(3)})))) / sqrt(2.0)))")
    // formatReadableTimeDelta(seconds): '2 days, 3 hours, 4 minutes, 5 seconds'
    q = rewriteCalls(q, "formatReadableTimeDelta")(a =>
      s"array_join(filter(array(" +
        s"IF(CAST(${a(0)} AS BIGINT) div 86400 > 0, concat(CAST(${a(0)} AS BIGINT) div 86400, ' days'), NULL), " +
        s"IF(CAST(${a(0)} AS BIGINT) % 86400 div 3600 > 0, concat(CAST(${a(0)} AS BIGINT) % 86400 div 3600, ' hours'), NULL), " +
        s"IF(CAST(${a(0)} AS BIGINT) % 3600 div 60 > 0, concat(CAST(${a(0)} AS BIGINT) % 3600 div 60, ' minutes'), NULL), " +
        s"IF(CAST(${a(0)} AS BIGINT) % 60 > 0 OR CAST(${a(0)} AS BIGINT) = 0, concat(CAST(${a(0)} AS BIGINT) % 60, ' seconds'), NULL)" +
        s"), __x -> __x IS NOT NULL), ', ')")
    // URLHierarchy / URLPathHierarchy (reference src/Functions/URL/
    // URLHierarchy.cpp): growing prefixes — simplified to the
    // protocol+host root plus each cumulative path segment, full URL
    // last when a query string is present
    q = rewriteCalls(q, "URLHierarchy")(a =>
      s"concat(aggregate(filter(split(coalesce(parse_url(${a(0)}, 'PATH'), ''), '/'), " +
        s"__s -> __s != ''), " +
        s"named_struct('o', array(concat(regexp_extract(${a(0)}, '^([a-z]+://[^/?#]+)', 1), '/')), " +
        s"'p', regexp_extract(${a(0)}, '^([a-z]+://[^/?#]+)', 1)), " +
        s"(__ac, __seg) -> named_struct('o', concat(__ac.o, array(concat(__ac.p, '/', __seg, '/'))), " +
        s"'p', concat(__ac.p, '/', __seg)), __ac -> __ac.o), " +
        s"IF(parse_url(${a(0)}, 'QUERY') IS NOT NULL, array(${a(0)}), " +
        s"CAST(array() AS ARRAY<STRING>)))")
    q = rewriteCalls(q, "URLPathHierarchy")(a =>
      s"aggregate(filter(split(coalesce(parse_url(${a(0)}, 'PATH'), ''), '/'), " +
        s"__s -> __s != ''), " +
        s"named_struct('o', CAST(array() AS ARRAY<STRING>), 'p', ''), " +
        s"(__ac, __seg) -> named_struct('o', concat(__ac.o, array(concat(__ac.p, '/', __seg, '/'))), " +
        s"'p', concat(__ac.p, '/', __seg)), __ac -> __ac.o)")
    // ---- batch 15 templates ----
    // multiSearchAllPositions(haystack, [needles]): first 1-based
    // position of each needle, 0 when absent (CH contract = Spark locate)
    q = rewriteCalls(q, "multiSearchAllPositions")(a =>
      s"transform(${a(1)}, __n -> position(__n, ${a(0)}))")
    q = rewriteCalls(q, "multiSearchAllPositionsCaseInsensitive")(a =>
      s"transform(${a(1)}, __n -> position(lower(__n), lower(${a(0)})))")
    // arraySplit(f, arr): cut BEFORE every element where f holds (the
    // first element never opens a new chunk); reverse form cuts AFTER —
    // composed through the forward pass (reverse form FIRST so its
    // emitted arraySplit is expanded by the pass below)
    q = rewriteCalls(q, "arrayReverseSplit")(a =>
      s"reverse(transform(arraySplit(${a(0)}, reverse(${a(1)})), __c -> reverse(__c)))")
    q = rewriteCalls(q, "arraySplit")(a =>
      s"aggregate(${a(1)}, " +
        s"named_struct('o', slice(array(${a(1)}), 1, 0), 'c', slice(${a(1)}, 1, 0)), " +
        s"(__ac, __v) -> IF(size(filter(array(__v), ${a(0)})) = 1 AND size(__ac.c) > 0, " +
        s"named_struct('o', concat(__ac.o, array(__ac.c)), 'c', array(__v)), " +
        s"named_struct('o', __ac.o, 'c', concat(__ac.c, array(__v)))), " +
        s"__ac -> IF(size(__ac.c) = 0, __ac.o, concat(__ac.o, array(__ac.c))))")
    // parseReadableSize('1.5 KiB') (reference parseReadableSize.cpp):
    // binary (KiB..TiB) and decimal (KB..TB) units
    def readableSize(x: String): String =
      s"(try_cast(regexp_extract(${x}, '^\\\\s*([0-9.]+)', 1) AS DOUBLE) * " +
        s"CASE trim(regexp_extract(${x}, '([A-Za-z]+)\\\\s*$$', 1)) " +
        s"WHEN 'B' THEN 1 WHEN 'KiB' THEN 1024 WHEN 'MiB' THEN 1048576 " +
        s"WHEN 'GiB' THEN 1073741824 WHEN 'TiB' THEN 1099511627776 " +
        s"WHEN 'KB' THEN 1000 WHEN 'MB' THEN 1000000 WHEN 'GB' THEN 1000000000 " +
        s"WHEN 'TB' THEN 1000000000000 END)"
    q = rewriteCalls(q, "parseReadableSizeOrNull")(a => readableSize(a(0)))
    q = rewriteCalls(q, "parseReadableSize")(a => readableSize(a(0)))
    // round-10 batch 24: bfloat16 grid + try-decode spellings
    q = rewriteCalls(q, "toBFloat16OrNull")(a =>
      s"to_bfloat16(try_cast(CAST(${a(0)} AS STRING) AS DOUBLE))")
    q = rewriteCalls(q, "toBFloat16OrZero")(a =>
      s"to_bfloat16(coalesce(try_cast(CAST(${a(0)} AS STRING) AS DOUBLE), 0.0))")
    q = rewriteCalls(q, "toBFloat16")(a => s"to_bfloat16(${a(0)})")
    // try* decodes return the EMPTY STRING on malformed input, not NULL
    // (same strict kernel as base64Decode — Spark's try_to_binary is
    // MIME-lenient and accepts inputs the reference rejects, 00732)
    q = rewriteCalls(q, "tryBase64Decode")(a =>
      s"base64_decode_try(${a(0)})")
    q = rewriteCalls(q, "tryBase64URLDecode")(a =>
      s"base64url_decode_try(${a(0)})")
    q = rewriteCalls(q, "parseReadableSizeOrZero")(a =>
      s"coalesce(${readableSize(a(0))}, 0.0)")

    // ---- batch 18 templates (round 9): small date/array tail ----
    // toWeek/toYearWeek (MySQL WEEK()/YEARWEEK() semantics, reference
    // DateLUTImpl toWeek): mode 0 (default) = Sunday-first weeks 0-53,
    // week 1 starting at the year's first Sunday; mode 3 = ISO. Other
    // modes are rejected at rewrite time.
    def firstSunday(yearExpr: String): String = {
      val jan1 = s"make_date($yearExpr, 1, 1)"
      s"date_add($jan1, (8 - dayofweek($jan1)) % 7)"
    }
    def weekMode(a: Seq[String]): Int =
      if (a.length > 1) stripName(a(1)).trim.toIntOption.getOrElse(
        throw new IllegalArgumentException("toWeek mode must be a literal"))
      else 0
    q = rewriteCalls(q, "yearweek")(a => s"toYearWeek(${a.mkString(", ")})")
    q = rewriteCalls(q, "week")(a => s"toWeek(${a.mkString(", ")})")
    q = rewriteCalls(q, "toYearWeek")(a => {
      weekMode(a) match {
        case 0 =>
          val d = s"CAST(${a(0)} AS DATE)"
          val fsThis = firstSunday(s"year($d)")
          val fsPrev = firstSunday(s"(year($d) - 1)")
          s"(CASE WHEN $d >= $fsThis THEN year($d) * 100 + (datediff($d, $fsThis) div 7) + 1 " +
            s"ELSE (year($d) - 1) * 100 + (datediff($d, $fsPrev) div 7) + 1 END)"
        case 3 =>
          s"(year(date_add(CAST(${a(0)} AS DATE), 3 - weekday(${a(0)}))) * 100 + weekofyear(${a(0)}))"
        case m => throw new IllegalArgumentException(s"toYearWeek mode $m unsupported (0 and 3 are)")
      }
    })
    q = rewriteCalls(q, "toWeek")(a => {
      weekMode(a) match {
        case 0 =>
          val d = s"CAST(${a(0)} AS DATE)"
          val fs = firstSunday(s"year($d)")
          s"(CASE WHEN $d < $fs THEN 0 ELSE (datediff($d, $fs) div 7) + 1 END)"
        case 3 => s"weekofyear(${a(0)})"
        case m => throw new IllegalArgumentException(s"toWeek mode $m unsupported (0 and 3 are)")
      }
    })

    // arrayLastIndex: last 1-based index where the lambda holds
    q = rewriteCalls(q, "arrayLastIndex")(a => {
      val marks = s"transform(${a(1)}, ${a(0)})"
      s"(CASE WHEN array_position(reverse($marks), true) IS NULL OR " +
        s"array_position(reverse($marks), true) = 0 THEN 0 " +
        s"ELSE size($marks) - array_position(reverse($marks), true) + 1 END)"
    })
    q = rewriteCalls(q, "YYYYMMDDToDate")(a =>
      s"to_date(CAST(CAST(${a(0)} AS BIGINT) AS STRING), 'yyyyMMdd')")
    q = rewriteCalls(q, "str_to_date")(a =>
      s"try_to_timestamp(${a(0)}, '${mysqlFmt(stripName(a(1)))}')")
    q = rewriteCalls(q, "addDate")(a => s"(${a(0)} + ${a(1)})")
    q = rewriteCalls(q, "subDate")(a => s"(${a(0)} - ${a(1)})")
    // ISO-year start: Monday of the week containing Jan 4 of isoYear(x)
    q = rewriteCalls(q, "toStartOfISOYear")(a => {
      val jan4 = s"make_date(year(date_add(CAST(${a(0)} AS DATE), 3 - weekday(${a(0)}))), 1, 4)"
      s"date_sub($jan4, weekday($jan4))"
    })
    q = rewriteCalls(q, "toWeekOfWeekYear")(a => s"weekofyear(${a(0)})")
    q = rewriteCalls(q, "toWeekYear")(a =>
      s"year(date_add(CAST(${a(0)} AS DATE), 3 - weekday(${a(0)})))")
    q = rewriteCalls(q, "fromUnixTimestamp64Second")(a =>
      s"timestamp_seconds(CAST(${a(0)} AS BIGINT))")
    q = rewriteCalls(q, "toUnixTimestamp64Second")(a =>
      s"unix_seconds(CAST(${a(0)} AS TIMESTAMP))")
    q = rewriteCalls(q, "fromUnixTimestamp64Nano")(a =>
      s"timestamp_micros(CAST(${a(0)} AS BIGINT) div 1000)")
    q = rewriteCalls(q, "toUnixTimestamp64Nano")(a =>
      s"(unix_micros(CAST(${a(0)} AS TIMESTAMP)) * 1000)")
    q = rewriteCalls(q, "moduloOrNull")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN NULL ELSE (${a(0)}) % (${a(1)}) END)")
    q = rewriteCalls(q, "positiveModuloOrNull")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN NULL ELSE pmod(${a(0)}, ${a(1)}) END)")
    q = rewriteCalls(q, "pmodOrNull")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN NULL ELSE pmod(${a(0)}, ${a(1)}) END)")
    q = rewriteCalls(q, "positive_modulo_or_null")(a =>
      s"(CASE WHEN (${a(1)}) = 0 THEN NULL ELSE pmod(${a(0)}, ${a(1)}) END)")
    q = rewriteCalls(q, "UTC_timestamp")(_ => "current_timestamp()")
    q = rewriteCalls(q, "curdate")(_ => "current_date()")
    // parseDateTime64* = the DateTime64 spellings of the parse family
    q = rewriteCalls(q, "parseDateTime64BestEffortOrNull")(a => bestEffort(a(0)))
    q = rewriteCalls(q, "parseDateTime64BestEffortOrZero")(a =>
      s"coalesce(${bestEffort(a(0))}, TIMESTAMP '1970-01-01 00:00:00')")
    q = rewriteCalls(q, "parseDateTime64BestEffort")(a => bestEffort(a(0)))
    q = rewriteCalls(q, "parseDateTime64OrNull")(a =>
      s"try_cast(${a(0)} AS TIMESTAMP)")
    q = rewriteCalls(q, "parseDateTime64OrZero")(a =>
      s"coalesce(try_cast(${a(0)} AS TIMESTAMP), TIMESTAMP '1970-01-01 00:00:00')")
    q = rewriteCalls(q, "parseDateTime64")(a =>
      s"CAST(${a(0)} AS TIMESTAMP)")
    q = rewriteCalls(q, "toDateTime64")(a => s"CAST(${a(0)} AS TIMESTAMP)")
    q = rewriteCalls(q, "toDateTime32")(a => s"CAST(${a(0)} AS TIMESTAMP)")

    // ---- batch 17 templates (round 9) ----
    // extractAllGroups{Vertical,Horizontal}(s, 're'): group count read
    // from the literal pattern (capturing '(' not escaped, not '(?')
    def countGroups(re: String): Int = {
      var c = 0
      var i = 0
      while (i < re.length) {
        if (re(i) == '(' && (i == 0 || re(i - 1) != '\\') &&
            (i + 1 >= re.length || re(i + 1) != '?')) c += 1
        i += 1
      }
      math.max(c, 1)
    }
    def vertical(a: Seq[String]): String = {
      val g = countGroups(stripName(a(1)))
      val g1 = s"regexp_extract_all(${a(0)}, ${a(1)}, 1)"
      s"(CASE WHEN size($g1) = 0 THEN array() ELSE " +
        s"transform(sequence(1, size($g1)), __i -> array(" +
        (1 to g).map(i => s"element_at(regexp_extract_all(${a(0)}, ${a(1)}, $i), __i)")
          .mkString(", ") + ")) END)"
    }
    q = rewriteCalls(q, "extractAllGroupsHorizontal")(a => {
      val g = countGroups(stripName(a(1)))
      "array(" + (1 to g).map(i => s"regexp_extract_all(${a(0)}, ${a(1)}, $i)")
        .mkString(", ") + ")"
    })
    q = rewriteCalls(q, "extractAllGroupsVertical")(vertical)
    q = rewriteCalls(q, "extractAllGroups")(vertical)

    // ---- batch 16 templates (round 9) ----
    // generic reinterpret(x, 'T') routes to the typed kernel
    q = rewriteCalls(q, "reinterpret")(a => {
      val t = stripName(a(1)).replaceAll("[^A-Za-z0-9]", "") match {
        case "UInt8" => "u8"
        case "UInt16" => "u16"
        case "UInt32" => "u32"
        case "UInt64" => "u64"
        case "Int8" => "i8"
        case "Int16" => "i16"
        case "Int32" => "i32"
        case "Int64" => "i64"
        case "Float32" => "f32"
        case "Float64" => "f64"
        case "Date" => "date"
        case "DateTime" => "datetime"
        case "String" => "string"
        case other => throw new IllegalArgumentException(
          s"reinterpret: unsupported target type $other")
      }
      s"ch_reinterpret_$t(${a(0)})"
    })
    // split family (splitByRegexp.cpp, splitByAlpha = alphaTokens,
    // splitByNonAlpha = tokens-with-punctuation): CH arg order (sep, s)
    q = rewriteCalls(q, "splitByRegexp")(a => s"split(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "splitByAlpha")(a => s"split(${a(0)}, '[^A-Za-z]+')")
    q = rewriteCalls(q, "splitByNonAlpha")(a => s"split(${a(0)}, '[^A-Za-z0-9]+')")
    // replaceOne (ReplaceStringImpl Replace::First): splice at first instr
    q = rewriteCalls(q, "replaceOne")(a =>
      s"(CASE WHEN instr(${a(0)}, ${a(1)}) > 0 THEN concat(" +
        s"substr(${a(0)}, 1, instr(${a(0)}, ${a(1)}) - 1), ${a(2)}, " +
        s"substr(${a(0)}, instr(${a(0)}, ${a(1)}) + length(${a(1)}))) " +
        s"ELSE ${a(0)} END)")
    // replaceRegexpOne: first-match-only kernel; the reference uses \\1
    // backrefs, Java uses $1 — convert inside literal replacement strings
    q = rewriteCalls(q, "replaceRegexpOne")(a => {
      val rep =
        if (a(2).trim.startsWith("'")) a(2).replaceAll("""\\\\(\d)""", """\$$$1""")
        else a(2)
      s"ch_replace_regexp_one(${a(0)}, ${a(1)}, $rep)"
    })
    q = rewriteCalls(q, "toStringCutToZero")(a =>
      s"(CASE WHEN instr(${a(0)}, chr(0)) > 0 " +
        s"THEN substr(${a(0)}, 1, instr(${a(0)}, chr(0)) - 1) ELSE ${a(0)} END)")
    q = rewriteCalls(q, "countMatchesCaseInsensitive")(a =>
      s"regexp_count(${a(0)}, concat('(?i)', ${a(1)}))")
    // date/time tail (DateLUTImpl.h formulas; Spark weekday() is 0=Monday)
    q = rewriteCalls(q, "toISOYear")(a => // year of the Thursday of x's week
      s"year(date_add(CAST(${a(0)} AS DATE), 3 - weekday(${a(0)})))")
    q = rewriteCalls(q, "toLastDayOfWeek")(a => // Sunday of x's Mon-Sun week
      s"date_add(CAST(${a(0)} AS DATE), 6 - weekday(${a(0)}))")
    q = rewriteCalls(q, "toStartOfFiveMinute")(a =>
      s"timestamp_seconds((unix_timestamp(${a(0)}) div 300) * 300)")
    q = rewriteCalls(q, "toStartOfMillisecond")(a =>
      s"timestamp_micros((unix_micros(CAST(${a(0)} AS TIMESTAMP)) div 1000) * 1000)")
    q = rewriteCalls(q, "toStartOfMicrosecond")(a =>
      s"timestamp_micros(unix_micros(CAST(${a(0)} AS TIMESTAMP)))")
    q = rewriteCalls(q, "toStartOfNanosecond")(a =>
      s"timestamp_micros(unix_micros(CAST(${a(0)} AS TIMESTAMP)))")
    q = rewriteCalls(q, "toMillisecond")(a =>
      s"((unix_micros(CAST(${a(0)} AS TIMESTAMP)) % 1000000) div 1000)")
    q = rewriteCalls(q, "toRelativeYearNum")(a => s"year(${a(0)})")
    q = rewriteCalls(q, "toRelativeQuarterNum")(a =>
      s"(year(${a(0)}) * 4 + (month(${a(0)}) - 1) div 3)")
    q = rewriteCalls(q, "toRelativeMonthNum")(a =>
      s"(year(${a(0)}) * 12 + month(${a(0)}))")
    q = rewriteCalls(q, "toRelativeWeekNum")(a => // Monday-based week count
      s"((datediff(CAST(${a(0)} AS DATE), DATE '1970-01-01') + 7 - weekday(${a(0)})) div 7)")
    // days since 0000-01-01 (proleptic Gregorian; 719528 days to epoch)
    q = rewriteCalls(q, "toDaysSinceYearZero")(a =>
      s"(datediff(CAST(${a(0)} AS DATE), DATE '1970-01-01') + 719528)")
    q = rewriteCalls(q, "fromDaysSinceYearZero32")(a =>
      s"date_add(DATE '1970-01-01', CAST(${a(0)} AS INT) - 719528)")
    q = rewriteCalls(q, "fromDaysSinceYearZero")(a =>
      s"date_add(DATE '1970-01-01', CAST(${a(0)} AS INT) - 719528)")
    q = rewriteCalls(q, "toMonthNumSinceEpoch")(a =>
      s"((year(${a(0)}) - 1970) * 12 + month(${a(0)}) - 1)")
    q = rewriteCalls(q, "toYearNumSinceEpoch")(a => s"(year(${a(0)}) - 1970)")
    q = rewriteCalls(q, "addMicroseconds")(a =>
      s"timestamp_micros(unix_micros(CAST(${a(0)} AS TIMESTAMP)) + CAST(${a(1)} AS BIGINT))")
    q = rewriteCalls(q, "subtractMicroseconds")(a =>
      s"timestamp_micros(unix_micros(CAST(${a(0)} AS TIMESTAMP)) - CAST(${a(1)} AS BIGINT))")
    // ns arith truncates to the engine's us precision
    q = rewriteCalls(q, "addNanoseconds")(a =>
      s"timestamp_micros(unix_micros(CAST(${a(0)} AS TIMESTAMP)) + (CAST(${a(1)} AS BIGINT) div 1000))")
    q = rewriteCalls(q, "subtractNanoseconds")(a =>
      s"timestamp_micros(unix_micros(CAST(${a(0)} AS TIMESTAMP)) - (CAST(${a(1)} AS BIGINT) div 1000))")
    q = rewriteCalls(q, "changeHour")(a =>
      s"make_timestamp(year(${a(0)}), month(${a(0)}), day(${a(0)}), ${a(1)}, " +
        s"minute(${a(0)}), second(${a(0)}))")
    q = rewriteCalls(q, "changeMinute")(a =>
      s"make_timestamp(year(${a(0)}), month(${a(0)}), day(${a(0)}), hour(${a(0)}), " +
        s"${a(1)}, second(${a(0)}))")
    q = rewriteCalls(q, "changeSecond")(a =>
      s"make_timestamp(year(${a(0)}), month(${a(0)}), day(${a(0)}), hour(${a(0)}), " +
        s"minute(${a(0)}), ${a(1)})")
    q = rewriteCalls(q, "parseDateTimeOrNull")(a =>
      if (a.length > 1) s"try_to_timestamp(${a(0)}, '${mysqlFmt(stripName(a(1)))}')"
      else s"try_cast(${a(0)} AS TIMESTAMP)")
    q = rewriteCalls(q, "parseDateTimeOrZero")(a =>
      if (a.length > 1)
        s"coalesce(try_to_timestamp(${a(0)}, '${mysqlFmt(stripName(a(1)))}'), TIMESTAMP '1970-01-01 00:00:00')"
      else s"coalesce(try_cast(${a(0)} AS TIMESTAMP), TIMESTAMP '1970-01-01 00:00:00')")
    q = rewriteCalls(q, "parseDateTimeBestEffortOrZero")(a =>
      s"coalesce(${bestEffort(a(0))}, TIMESTAMP '1970-01-01 00:00:00')")
    q = rewriteCalls(q, "parseDateTime32BestEffortOrNull")(a => bestEffort(a(0)))
    q = rewriteCalls(q, "parseDateTime32BestEffortOrZero")(a =>
      s"coalesce(${bestEffort(a(0))}, TIMESTAMP '1970-01-01 00:00:00')")
    q = rewriteCalls(q, "parseDateTime32BestEffort")(a => bestEffort(a(0)))
    // snowflake codecs (snowflake.cpp legacy: Twitter epoch baked in;
    // snowflakeIDToDateTime.cpp: epoch arg, default 0)
    q = rewriteCalls(q, "snowflakeToDateTime")(a =>
      s"timestamp_seconds(((shiftright(CAST(${a(0)} AS BIGINT), 22)) + 1288834974657) div 1000)")
    q = rewriteCalls(q, "snowflakeToDateTime64")(a =>
      s"timestamp_millis(shiftright(CAST(${a(0)} AS BIGINT), 22) + 1288834974657)")
    q = rewriteCalls(q, "dateTimeToSnowflake")(a =>
      s"shiftleft(unix_seconds(CAST(${a(0)} AS TIMESTAMP)) * 1000 - 1288834974657, 22)")
    q = rewriteCalls(q, "dateTime64ToSnowflake")(a =>
      s"shiftleft(unix_millis(CAST(${a(0)} AS TIMESTAMP)) - 1288834974657, 22)")
    q = rewriteCalls(q, "snowflakeIDToDateTime64")(a =>
      if (a.length > 1)
        s"timestamp_millis(shiftright(CAST(${a(0)} AS BIGINT), 22) + CAST(${a(1)} AS BIGINT))"
      else s"timestamp_millis(shiftright(CAST(${a(0)} AS BIGINT), 22))")
    q = rewriteCalls(q, "snowflakeIDToDateTime")(a =>
      if (a.length > 1)
        s"timestamp_seconds((shiftright(CAST(${a(0)} AS BIGINT), 22) + CAST(${a(1)} AS BIGINT)) div 1000)"
      else s"timestamp_seconds(shiftright(CAST(${a(0)} AS BIGINT), 22) div 1000)")
    q = rewriteCalls(q, "dateTimeToSnowflakeID")(a =>
      if (a.length > 1)
        s"shiftleft(unix_seconds(CAST(${a(0)} AS TIMESTAMP)) * 1000 - CAST(${a(1)} AS BIGINT), 22)"
      else s"shiftleft(unix_seconds(CAST(${a(0)} AS TIMESTAMP)) * 1000, 22)")
    q = rewriteCalls(q, "dateTime64ToSnowflakeID")(a =>
      if (a.length > 1)
        s"shiftleft(unix_millis(CAST(${a(0)} AS TIMESTAMP)) - CAST(${a(1)} AS BIGINT), 22)"
      else s"shiftleft(unix_millis(CAST(${a(0)} AS TIMESTAMP)), 22)")
    // UUIDv7: first 48 bits = unix ms (UUIDv7ToDateTime.cpp)
    q = rewriteCalls(q, "UUIDv7ToDateTime")(a =>
      s"timestamp_millis(CAST(conv(substr(replace(CAST(${a(0)} AS STRING), '-', ''), 1, 12), 16, 10) AS BIGINT))")
    // ULID: first 10 Crockford-base32 chars = unix ms (ULIDStringToDateTime)
    q = rewriteCalls(q, "ULIDStringToDateTime")(a =>
      s"timestamp_millis(aggregate(sequence(1, 10), CAST(0 AS BIGINT), " +
        s"(__a, __i) -> __a * 32 + CAST(position(substr(upper(${a(0)}), __i, 1), " +
        s"'0123456789ABCDEFGHJKMNPQRSTVWXYZ') - 1 AS BIGINT)))")
    // UUID string <-> 16-byte binary (UUIDStringToNum variant 1 = as-is)
    q = rewriteCalls(q, "UUIDStringToNum")(a =>
      s"unhex(replace(CAST(${a(0)} AS STRING), '-', ''))")
    q = rewriteCalls(q, "UUIDToNum")(a =>
      s"unhex(replace(CAST(${a(0)} AS STRING), '-', ''))")
    q = rewriteCalls(q, "UUIDNumToString")(a => {
      val h = s"lower(hex(${a(0)}))"
      s"concat_ws('-', substr($h, 1, 8), substr($h, 9, 4), substr($h, 13, 4), " +
        s"substr($h, 17, 4), substr($h, 21, 12))"
    })
    // map *Like probes (mapContainsKeyLike.cpp family)
    q = rewriteCalls(q, "mapContainsKeyLike")(a =>
      s"exists(map_keys(${a(0)}), __k -> __k LIKE ${a(1)})")
    q = rewriteCalls(q, "mapContainsValueLike")(a =>
      s"exists(map_values(${a(0)}), __v -> __v LIKE ${a(1)})")
    q = rewriteCalls(q, "mapExtractKeyLike")(a =>
      s"map_filter(${a(0)}, (__k, __v) -> __k LIKE ${a(1)})")
    q = rewriteCalls(q, "mapExtractValueLike")(a =>
      s"map_filter(${a(0)}, (__k, __v) -> __v LIKE ${a(1)})")
    // LinfNorm/L2SquaredNorm canonical forms (the norm*/distance* aliases
    // are canonicalized early, before the L*Norm/L*Distance templates)
    q = rewriteCalls(q, "LinfNorm")(a =>
      s"array_max(transform(${a(0)}, __x -> abs(CAST(__x AS DOUBLE))))")
    q = rewriteCalls(q, "L2SquaredNorm")(a =>
      s"aggregate(${a(0)}, CAST(0 AS DOUBLE), (__s, __x) -> __s + CAST(__x AS DOUBLE) * CAST(__x AS DOUBLE))")
    q = rewriteCalls(q, "scalarProduct")(a => s"dot_product(${a(0)}, ${a(1)})")
    // simpleJSON / visitParam numeric-ish tail (non-strict parser in the
    // reference; equal on well-formed JSON)
    q = rewriteCalls(q, "simpleJSONExtractBool")(a =>
      s"(get_json_object(${a(0)}, concat('$$.', ${a(1)})) = 'true')")
    q = rewriteCalls(q, "simpleJSONExtractFloat")(a =>
      s"coalesce(try_cast(get_json_object(${a(0)}, concat('$$.', ${a(1)})) AS DOUBLE), 0.0)")
    q = rewriteCalls(q, "simpleJSONExtractUInt")(a =>
      s"coalesce(try_cast(try_cast(get_json_object(${a(0)}, concat('$$.', ${a(1)})) AS DOUBLE) AS BIGINT), 0)")
    q = rewriteCalls(q, "visitParamExtractBool")(a =>
      s"(get_json_object(${a(0)}, concat('$$.', ${a(1)})) = 'true')")
    q = rewriteCalls(q, "visitParamExtractFloat")(a =>
      s"coalesce(try_cast(get_json_object(${a(0)}, concat('$$.', ${a(1)})) AS DOUBLE), 0.0)")
    q = rewriteCalls(q, "visitParamExtractUInt")(a =>
      s"coalesce(try_cast(try_cast(get_json_object(${a(0)}, concat('$$.', ${a(1)})) AS DOUBLE) AS BIGINT), 0)")

    // `x :: JSON` / CAST(x AS JSON) arrive here spelled toJSON(x) (the
    // ParserCastOperator rewrite emits to<Type>): normalize through the
    // JSON-object-type renderer (sorted paths, scalar leaves as strings)
    q = rewriteCalls(q, "toJSON")(a => s"ch_json_norm(${a(0)})")

    // SQL-standard EXTRACT(unit FROM expr) (reference ParserFunction
    // parses it into toMinute/toHour/...): convert to date_part BEFORE
    // the alias map renames extract -> regexp_extract (CH's two-arg
    // extract(haystack, pattern) is the regex form and keeps the alias)
    q = q.replaceAll(
      "(?i)\\bextract\\s*\\(\\s*(second|minute|hour|day|dayofmonth|" +
        "dayofweek|dayofyear|doy|week|month|quarter|year)\\s+FROM\\b",
      "date_part('$1', ")

    // plain 1:1 aliases (word-boundary)
    for ((ch, sp) <- aliases if !templated.contains(ch)) {
      q = q.replaceAll(s"""\\b$ch\\s*\\(""", sp + "(")
    }

    // ORDER BY x COLLATE 'name' (reference src/Columns/Collator.h — ICU
    // locale collations): map onto Spark 4 collation names. Locales map
    // to UNICODE (CH collations are locale-aware, case-sensitive);
    // *_ci names to UNICODE_CI; binary/nocase to the UTF8 collations.
    {
      val m = java.util.regex.Pattern
        .compile("(?i)(\\w+)\\s+COLLATE\\s+'([\\w.-]+)'").matcher(q)
      val sb = new StringBuffer
      while (m.find()) {
        val target = m.group(2).toLowerCase match {
          case "binary" => "UTF8_BINARY"
          case "nocase" | "lcase" => "UTF8_LCASE"
          case n if n.endsWith("_ci") => "UNICODE_CI"
          case _ => "UNICODE"
        }
        m.appendReplacement(sb,
          java.util.regex.Matcher.quoteReplacement(s"collate(${m.group(1)}, '$target')"))
      }
      m.appendTail(sb)
      q = sb.toString
    }

    // FINAL modifier: our catalog views are already merge-final
    q = q.replaceAll("""(?i)\bFINAL\b""", "")

    // GROUP BY ... WITH TOTALS (reference TotalsHavingTransform.cpp):
    // the per-group rows plus one grand-total row — exactly GROUPING
    // SETS ((keys), ()); the totals row carries NULL keys (the
    // reference emits type defaults there — same row, different
    // placeholder, documented).
    {
      val m = java.util.regex.Pattern
        .compile("(?is)GROUP BY\\s+(.*?)\\s+WITH\\s+TOTALS").matcher(q)
      val sb = new StringBuffer
      var nTotals = 0; var atTopLevel = false
      while (m.find()) {
        nTotals += 1
        val keys = m.group(1).trim
        // record simple-identifier key lists so the anchor runner can
        // render the totals BLOCK the way the reference does (blank
        // line, key columns as type defaults, after the data rows)
        val ks = splitArgs(keys).map(_.trim.stripPrefix("`").stripSuffix("`"))
        lastTotalsKeys =
          if (ks.nonEmpty && ks.forall(_.matches("[A-Za-z_]\\w*"))) Some(ks)
          else None
        // paren depth at the match start in the ORIGINAL text: only a
        // depth-0 GROUP BY belongs to the outer select
        atTopLevel = {
          var d = 0; var inStr = false; var i = 0
          while (i < m.start) {
            val c = q.charAt(i)
            if (inStr) { if (c == '\'') inStr = false }
            else if (c == '\'') inStr = true
            else if (c == '(') d += 1
            else if (c == ')') d -= 1
            i += 1
          }
          d == 0
        }
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
          s"GROUP BY GROUPING SETS (($keys), ())"))
      }
      m.appendTail(sb)
      q = sb.toString
      // when the anchor runner asks (emitTotalsMarker), append a
      // grouping() marker column so it can tell the GROUPING SETS total
      // apart from a genuine all-NULL-key data group. Appended at the
      // END of the select list so positional ORDER BY stays valid; only
      // for a single top-level TOTALS over simple keys.
      if (emitTotalsMarker && nTotals == 1 && atTopLevel &&
          lastTotalsKeys.isDefined &&
          "(?is)^\\s*SELECT\\b".r.findFirstIn(q).isDefined) {
        val fromIdx = topLevelIndexOf(q, "FROM")
        if (fromIdx > 0)
          q = q.substring(0, fromIdx) +
            s", grouping(`${lastTotalsKeys.get.head}`) AS __totals_mark " +
            q.substring(fromIdx)
      }
    }

    // PREWHERE -> WHERE (merge with existing WHERE if both present).
    // A table NAMED prewhere must not match (00140): the keyword can't
    // directly follow FROM/TABLE/INTO/EXISTS/JOIN (all length-5
    // lookbehinds with their trailing space).
    val prewhereKw =
      "(?i)(?<!(?:FROM|ABLE|INTO|ISTS|JOIN)\\s)\\bPREWHERE\\b"
    if (prewhereKw.r.findFirstIn(q).isDefined &&
        "(?is)PREWHERE\\b.*\\bWHERE\\b".r.findFirstIn(
          q.substring(prewhereKw.r.findFirstMatchIn(q).get.start)).isDefined) {
      // PREWHERE p ... WHERE w  ->  WHERE (p) AND (w)
      val m = java.util.regex.Pattern
        .compile("(?is)" + prewhereKw + "(.*?)\\bWHERE(.*?)(GROUP BY|ORDER BY|LIMIT|QUALIFY|$)")
        .matcher(q)
      if (m.find()) {
        // a standalone PREWHERE of Float64 type is ILLEGAL in the
        // reference (02680) — the AND-merge below would hide the type,
        // so catch the modulo-by-float-zero signature textually
        if ("(?i)%\\s*CAST\\('-0\\.0' AS DOUBLE\\)\\s*$".r
            .findFirstIn(m.group(1).trim).isDefined)
          throw new IllegalArgumentException(
            "ILLEGAL_TYPE_OF_COLUMN_FOR_FILTER: Float PREWHERE")
        q = q.substring(0, m.start) + "WHERE (" + m.group(1).trim + ") AND (" +
          m.group(2).trim + ") " + q.substring(m.start(3))
      }
    } else q = q.replaceAll(prewhereKw, "WHERE")

    // QUALIFY cond -> wrap as subquery filter (cond must reference
    // select-list aliases, the common CH usage)
    val qual = java.util.regex.Pattern
      .compile("(?is)(.*)\\bQUALIFY\\b(.*?)(ORDER BY.*|LIMIT.*|$)").matcher(q)
    if (qual.matches()) {
      val (body, cond, tail) = (qual.group(1).trim, qual.group(2).trim, qual.group(3).trim)
      q = s"SELECT * FROM ($body) WHERE $cond $tail"
    }

    // ORDER BY col WITH FILL FROM a TO b STEP s  (reference
    // FillingTransform): generate the grid, left-join the query, order.
    // Missing measure columns stay NULL here (Fill.withFillLong offers
    // default-fill/carry semantics on the DataFrame side).
    val wf = java.util.regex.Pattern
      .compile("(?is)(.*)\\bORDER BY\\s+(\\w+)\\s+WITH FILL\\s+FROM\\s+(\\S+)\\s+TO\\s+(\\S+)\\s+STEP\\s+(\\S+)\\s*$")
      .matcher(q)
    if (wf.matches()) {
      val (body, c, a, b, st) = (wf.group(1).trim, wf.group(2), wf.group(3), wf.group(4), wf.group(5))
      q = s"""SELECT * FROM (SELECT explode(sequence($a, $b, $st)) AS $c) __grid
             |LEFT JOIN ($body) USING ($c) ORDER BY $c""".stripMargin
    }

    // MySQL-style LIMIT offset, count (reference ParserSelectQuery
    // allows both spellings) — not when a BY clause follows (that is
    // CH's LIMIT n, m BY form, handled below)
    q = q.replaceAll("(?i)\\bLIMIT\\s+(\\d+)\\s*,\\s*(\\d+)(?!\\s*BY\\b)",
      "LIMIT $2 OFFSET $1")

    // LIMIT n BY (cols): keep first n rows per key in current order
    val lby = java.util.regex.Pattern
      .compile("(?is)(.*?)\\bLIMIT\\s+(\\d+)\\s+BY\\s+\\(?([\\w, ]+?)\\)?\\s*(ORDER BY.*|LIMIT.*|$)")
      .matcher(q)
    if (lby.matches()) {
      val (body, n, cols, tail) = (lby.group(1).trim, lby.group(2), lby.group(3).trim, lby.group(4).trim)
      // order within groups: the query's ORDER BY if present in body, else cols
      val ord = {
        val om = java.util.regex.Pattern.compile("(?is)ORDER BY\\s+(.*)$").matcher(body)
        if (om.find()) om.group(1) else cols
      }
      val bodyNoOrd = body.replaceAll("(?is)ORDER BY\\s+.*$", "")
      q = s"""SELECT * EXCEPT (__rn) FROM (
             |  SELECT *, row_number() OVER (PARTITION BY $cols ORDER BY $ord) AS __rn
             |  FROM ($bodyNoOrd)) WHERE __rn <= $n $tail""".stripMargin
    }

    // LAST: CH floating literals are Float64 (reference
    // src/Parsers/Lexer.cpp number tokens; docs: fractional literals are
    // Float64); Spark parses 7.0 as DECIMAL(2,1), silently turning n/7.0
    // into scale-6 decimal division (found by the float fuzzer:
    // 157/7.0 returned 22.428571 instead of 22.42857142857…). Suffix
    // fractional/exponent literals with D so Spark types them DOUBLE.
    // Runs after every template so parameterized-aggregate syntax
    // (quantile(0.5)(x)) and literal-parsing templates see plain numbers;
    // D on template-emitted literals inside CASTs is value-preserving.
    q = rewriteFloatLiterals(q)

    // `x IN [a, b, c]` arrived here as `x IN array(a, b, c)` (the
    // bracket-literal pass) — Spark's IN wants a plain list (03257)
    q = q.replaceAll("(?i)\\b(IN)\\s+array\\s*\\(", "$1 (")

    q.trim
  }

  /** Column transformers `* REPLACE (expr AS col)`, `* APPLY (fn)` and
    * `COLUMNS('regex') [APPLY (fn)]` (reference
    * src/Parsers/ASTColumnsTransformers.cpp). These need the schema, so
    * expansion happens against the catalog BEFORE the textual rewrite and
    * only in an unambiguous single-FROM-table context — `* EXCEPT (cols)`
    * needs no expansion (Spark-native). REPLACE keeps the original column
    * order, as the reference does. */
  private def expandColumnsTransformers(spark: SparkSession, q0: String): String = {
    // fast-path: nothing to expand (markers are rare; this runs per query)
    val lower = q0.toLowerCase
    if (!lower.contains("columns(") && !lower.contains("columns (") &&
        !lower.contains("replace") && !lower.contains("apply") &&
        !lower.contains("except")) return q0
    val fromRe = "(?i)\\bFROM\\s+(\\w+)".r
    // "FROM 0" (WITH FILL bounds etc.) must not reach tableExists — the
    // catalog parses the identifier and throws on non-identifiers
    val froms = fromRe.findAllMatchIn(q0).map(_.group(1))
      .filter(t => t.matches("[A-Za-z_]\\w*") &&
        (try spark.catalog.tableExists(t) catch { case _: Exception => false }))
      .toList.distinct
    val cols: Array[String] =
      if (froms.size == 1) spark.table(froms.head).columns
      else if (froms.nonEmpty) return q0
      // numbers()/system.numbers generators expose one column
      else if ("(?i)\\bFROM\\s+(?:system\\.)?numbers(?:_mt)?\\s*[(\\s;)]"
          .r.findFirstIn(q0 + " ").isDefined) Array("number")
      else {
        // FROM (SELECT <aliased list>): derive the output names textually
        val fi = "(?is)\\bFROM\\s*\\(".r.findFirstMatchIn(q0)
        fi.flatMap { m =>
          val open = q0.indexOf('(', m.end - 1)
          var depth = 0; var i = open; var inStr = false; var closeI = -1
          while (i < q0.length && closeI < 0) {
            val c = q0.charAt(i)
            if (inStr) { if (c == '\'') inStr = false }
            else if (c == '\'') inStr = true
            else if (c == '(') depth += 1
            else if (c == ')') { depth -= 1; if (depth == 0) closeI = i }
            i += 1
          }
          if (closeI < 0) None
          else {
            val inner = q0.substring(open + 1, closeI).trim
            if (!"(?is)^SELECT\\b".r.findFirstIn(inner).isDefined) None
            else {
              val listEnd = topLevelIndexOf(inner, "FROM") match {
                case -1 => inner.length; case x => x
              }
              val items = splitArgs(inner.substring(6, listEnd)).map(_.trim)
              val names = items.map { it =>
                val asIdx = "(?i)\\s+AS\\s+(\\w+)\\s*$".r.findFirstMatchIn(it)
                asIdx.map(_.group(1))
                  .orElse(if (it.matches("[A-Za-z_]\\w*")) Some(it) else None)
              }
              if (names.exists(_.isEmpty)) None else Some(names.flatten.toArray)
            }
          }
        }.getOrElse(return q0)
      }
    // balanced-paren body starting at an opening paren index
    def parenBody(s: String, open: Int): Option[(String, Int)] = {
      var depth = 0; var i = open; var inStr = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return Some((s.substring(open + 1, i), i)) }
        i += 1
      }
      None
    }
    // marker regexes capture a select-list prefix (SELECT or ',') in
    // group 1, so `x * REPLACE(...)` multiplication never false-positives
    def expandOne(q: String, marker: String, render: String => Option[String]): String = {
      val re = ("(?is)" + marker).r
      var changed = true
      var out = q
      while (changed) {
        changed = false
        re.findFirstMatchIn(out) match {
          case Some(m) =>
            val open = out.indexOf('(', m.end - 1)
            if (open >= 0) parenBody(out, open) match {
              case Some((body, close)) =>
                render(body) match {
                  case Some(repl) =>
                    out = out.substring(0, m.start) + m.group(1) + repl +
                      out.substring(close + 1)
                    changed = true
                  case None => ()
                }
              case None => ()
            }
          case None => ()
        }
      }
      out
    }
    var q = q0
    // * EXCEPT ('regex' | cols) [APPLY (fn)] — the regex form and APPLY
    // chaining need the schema; the plain list form without APPLY is
    // Spark-native and left untouched
    locally {
      val exRe = "(?is)(SELECT\\s+|,\\s*)\\*\\s+EXCEPT\\s*\\(".r
      var changed = true
      while (changed) {
        changed = false
        exRe.findFirstMatchIn(q).foreach { m =>
          parenBody(q, q.indexOf('(', m.end - 1)).foreach { case (body, close) =>
            val after = q.substring(close + 1)
            val applyM = "(?is)^\\s*APPLY\\s*\\(\\s*(\\w+)\\s*\\)".r.findFirstMatchIn(after)
            val isRegex = body.trim.startsWith("'")
            if (isRegex || applyM.isDefined) {
              val excluded: Set[String] =
                if (isRegex) {
                  val re = body.trim.stripPrefix("'").stripSuffix("'")
                  cols.filter(_.matches(re)).toSet
                } else splitArgs(body).map(_.trim).toSet
              val kept = cols.filterNot(excluded)
              if (kept.nonEmpty) {
                val rendered = applyM match {
                  case Some(am) =>
                    val fn = am.group(1)
                    kept.map(c => s"$fn($c) AS `$fn($c)`").mkString(", ")
                  case None => kept.mkString(", ")
                }
                val afterEnd = close + 1 + applyM.map(_.end).getOrElse(0)
                q = q.substring(0, m.start) + m.group(1) + rendered +
                  q.substring(afterEnd)
                changed = true
              }
            }
          }
        }
      }
    }
    // chains of APPLY (fn) / APPLY fn after a column-set marker — the
    // reference allows both spellings and stacking (01470):
    // COLUMNS('[jk]') APPLY(toString) APPLY(length)
    def applyChain(s: String, pos0: Int): (List[String], Int) = {
      val re1 = "(?is)^\\s*APPLY\\s*\\(\\s*(\\w+)\\s*\\)".r
      val re2 = "(?is)^\\s*APPLY\\s+(\\w+)".r
      var pos = pos0; var fns = List.empty[String]; var cont = true
      while (cont) {
        val after = s.substring(pos)
        re1.findFirstMatchIn(after).orElse(re2.findFirstMatchIn(after)) match {
          case Some(m) => fns = fns :+ m.group(1); pos += m.end
          case None => cont = false
        }
      }
      (fns, pos)
    }
    def renderChain(sel: Seq[String], fns: List[String]): String =
      sel.map { c =>
        val expr = fns.foldLeft(c)((e, f) => s"$f($e)")
        if (fns.isEmpty) c else s"$expr AS `$expr`"
      }.mkString(", ")
    // COLUMNS('re') [APPLY ...]* — anywhere an expression can appear
    // (select list, function args, arithmetic); the regex is UNANCHORED
    // (reference ASTColumnsMatcher uses RE2 partial match: 'ber' matches
    // 'number'); an empty match set deletes the marker and its adjacent
    // comma (an empty SELECT then fails like the reference's
    // EMPTY_LIST_OF_COLUMNS_QUERIED)
    locally {
      val re = "(?is)\\bCOLUMNS\\s*\\(".r
      var changed = true
      while (changed) {
        changed = false
        re.findFirstMatchIn(q).foreach { m =>
          parenBody(q, q.indexOf('(', m.end - 1)).foreach { case (body, close) =>
            if (body.trim.startsWith("'")) {
              val rex = body.trim.stripPrefix("'").stripSuffix("'")
              val sel = cols.filter(c =>
                rex.isEmpty ||
                  (try rex.r.findFirstIn(c).isDefined
                   catch { case _: Exception => false })).toSeq
              val (fns, end) = applyChain(q, close + 1)
              // a multi-match COLUMNS used as an OPERAND of a binary
              // operator makes the operator's arg lists mismatch in the
              // reference (NUMBER_OF_ARGUMENTS_DOESNT_MATCH) — plus(a,b)
              // + plus(b) is not well-formed
              if (sel.size > 1) {
                var j2 = end
                while (j2 < q.length && q.charAt(j2).isWhitespace) j2 += 1
                var k2 = m.start - 1
                while (k2 >= 0 && q.charAt(k2).isWhitespace) k2 -= 1
                val ops = "+-*/%"
                if ((j2 < q.length && ops.contains(q.charAt(j2))) ||
                    (k2 >= 0 && ops.contains(q.charAt(k2))))
                  throw new IllegalArgumentException(
                    "NUMBER_OF_ARGUMENTS_DOESNT_MATCH: COLUMNS matched " +
                      s"${sel.size} columns as an operand of a binary operator")
              }
              if (sel.nonEmpty) {
                q = q.substring(0, m.start) + renderChain(sel, fns) +
                  q.substring(end)
              } else {
                var st = m.start
                var k = st - 1
                while (k >= 0 && q.charAt(k).isWhitespace) k -= 1
                if (k >= 0 && q.charAt(k) == ',') st = k
                var j = end
                if (st == m.start) {
                  while (j < q.length && q.charAt(j).isWhitespace) j += 1
                  if (j < q.length && q.charAt(j) == ',') j += 1 else j = end
                }
                q = q.substring(0, st) + q.substring(j)
              }
              changed = true
            }
          }
        }
      }
    }
    // [qualifier.]* APPLY chain (paren or bare-name form)
    locally {
      val re = "(?is)(SELECT\\s+|,\\s*)(?:\\w+\\.)?\\*\\s+(?=APPLY\\b)".r
      var changed = true
      while (changed) {
        changed = false
        re.findFirstMatchIn(q).foreach { m =>
          val (fns, end) = applyChain(q, m.end)
          if (fns.nonEmpty) {
            q = q.substring(0, m.start) + m.group(1) +
              renderChain(cols.toSeq, fns) + q.substring(end)
            changed = true
          }
        }
      }
    }
    q = expandOne(q, "(SELECT\\s+|,\\s*)\\*\\s+REPLACE\\s*\\(", body => {
      val parsed = splitArgs(body).map { a =>
        val i = a.toLowerCase.lastIndexOf(" as ")
        if (i < 0) None else Some(a.substring(i + 4).trim -> a.substring(0, i).trim)
      }
      if (parsed.exists(_.isEmpty)) None
      else {
        val repls = parsed.flatten.toMap
        Some(cols.map(c => repls.get(c).map(e => s"($e) AS $c").getOrElse(c)).mkString(", "))
      }
    })
    q
  }

  /** Run a ClickHouse-flavoured query against the fixture catalog.
    * Also provides the reference's `system.numbers` / `system.one`
    * virtual tables (src/TableFunctions + system tables used throughout
    * the reference's stateless tests). */
  /** Fixed-arity table for functions whose argument-count errors the
    * reference raises at ANALYSIS time (NUMBER_OF_ARGUMENTS_DOESNT_MATCH,
    * reference IFunction::checkNumberOfArguments). Checked textually
    * before rewrite so misuse fails the statement, not the executor. */
  private val fnArity: Map[String, (Int, Int)] = Map(
    "uuidtonum" -> (1, 2), "base64decode" -> (1, 1), "base64encode" -> (1, 1),
    "base64urlencode" -> (1, 1), "base64urldecode" -> (1, 1),
    "trybase64decode" -> (1, 1), "trybase64urldecode" -> (1, 1),
    "base32encode" -> (1, 1), "base32decode" -> (1, 1),
    "trybase32decode" -> (1, 1),
    "base58encode" -> (1, 1), "base58decode" -> (1, 1),
    "trybase58decode" -> (1, 1),
    "neighbor" -> (2, 3), "isconstant" -> (1, 1),
    "multiply" -> (2, 2), "plus" -> (2, 2), "minus" -> (2, 2),
    "divide" -> (2, 2), "intdiv" -> (2, 2), "modulo" -> (2, 2),
    "gcd" -> (2, 2), "lcm" -> (2, 2),
    "h3getres0indexes" -> (0, 0),
    "timeslots" -> (2, 3), "tupleconcat" -> (1, Int.MaxValue),
    "arrayshingles" -> (2, 2),
    "fromdayssinceyearzero" -> (1, 1), "fromdayssinceyearzero32" -> (1, 1),
    "todayssinceyearzero" -> (1, 2),
    "idnaencode" -> (1, 1), "idnadecode" -> (1, 1), "tryidnaencode" -> (1, 1),
    "punycodeencode" -> (1, 1), "punycodedecode" -> (1, 1),
    "trypunycodedecode" -> (1, 1),
    "sqidencode" -> (1, Int.MaxValue), "sqiddecode" -> (1, 1),
    "changeyear" -> (2, 2), "changemonth" -> (2, 2), "changeday" -> (2, 2),
    "changehour" -> (2, 2), "changeminute" -> (2, 2), "changesecond" -> (2, 2),
    "generateserialid" -> (1, 1), "generatesnowflakeid" -> (0, 2),
    "parsereadablesize" -> (1, 1), "parsereadablesizeornull" -> (1, 1),
    "parsereadablesizeorzero" -> (1, 1),
    "bitslice" -> (2, 3), "comparesubstrings" -> (5, 5),
    "tokens" -> (1, 3), "datetimetosnowflakeid" -> (1, 2),
    "datetime64tosnowflakeid" -> (1, 2))

  private[sqlfront] def checkFunctionArity(q0: String): Unit = {
    // scan a literal- and comment-masked copy: function-shaped text in a
    // string ('plus(1, 2, 3)') or a commented-out call must not trip the
    // arity check (same discipline as the USING rewrite's masked copy)
    val q = locally {
      val sb = new StringBuilder(q0); var i = 0
      var inStr = false; var inLine = false; var inBlock = false
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (inStr) { if (c == '\'') inStr = false else sb.setCharAt(i, ' ') }
        else if (inLine) {
          if (c == '\n') inLine = false else sb.setCharAt(i, ' ')
        } else if (inBlock) {
          if (c == '*' && i + 1 < sb.length && sb.charAt(i + 1) == '/') {
            sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' ')
            inBlock = false; i += 1
          } else if (c != '\n') sb.setCharAt(i, ' ')
        } else if (c == '\'') inStr = true
        else if (c == '-' && i + 1 < sb.length && sb.charAt(i + 1) == '-') {
          sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' ')
          inLine = true; i += 1
        } else if (c == '/' && i + 1 < sb.length && sb.charAt(i + 1) == '*') {
          sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' ')
          inBlock = true; i += 1
        }
        i += 1
      }
      sb.toString
    }
    val fnRe = "(?i)\\b([A-Za-z_][A-Za-z_0-9]*)\\s*\\(".r
    for (m <- fnRe.findAllMatchIn(q)) {
      val fn = m.group(1).toLowerCase
      fnArity.get(fn).foreach { case (lo, hi) =>
        // count top-level commas between the matching parens
        var i = m.end; var depth = 1; var inStr = false
        var commas = 0; var nonWs = false
        while (i < q.length && depth > 0) {
          val c = q.charAt(i)
          if (inStr) { if (c == '\'') inStr = false }
          else c match {
            case '\'' => inStr = true; nonWs = true
            case '(' | '[' => depth += 1; nonWs = true
            case ')' | ']' => depth -= 1
            case ',' => if (depth == 1) commas += 1; nonWs = true
            case ch => if (!ch.isWhitespace) nonWs = true
          }
          i += 1
        }
        if (depth == 0) {
          val n = if (!nonWs) 0 else commas + 1
          // a COLUMNS(...) matcher expands to several arguments later —
          // the textual count is meaningless there (00969)
          val argTxt = q.substring(m.end, i - 1)
          val expandsLater =
            "(?i)\\bCOLUMNS\\s*\\(".r.findFirstIn(argTxt).isDefined ||
              argTxt.trim == "*"
          if ((n < lo || n > hi) && !expandsLater)
            throw new IllegalArgumentException(
              s"NUMBER_OF_ARGUMENTS_DOESNT_MATCH: function ${m.group(1)} " +
                s"expects ${if (lo == hi) s"$lo" else s"$lo..$hi"} " +
                s"arguments, got $n")
        }
      }
    }
  }

  /** Positions lying in a WHERE / PREWHERE / GROUP BY / HAVING region —
    * the contexts where CH's IdentifierSemantic resolves a bare column
    * present on BOTH join sides to the LEFT table (QueryNormalizer).
    * The SELECT list and JOIN ON clauses are deliberately EXCLUDED: an
    * ambiguous reference inside ON is INVALID_JOIN_ON_EXPRESSION in the
    * reference (00800), and leaving SELECT-list ambiguity to fail keeps
    * must-fail anchors like 03402 failing. A region ends at the next
    * clause keyword at the same nesting depth or at the subquery's
    * closing paren. */
  private def whereContextRanges(q: String): Seq[(Int, Int)] = {
    val starters = Seq("WHERE", "PREWHERE", "HAVING", "GROUP")
    val enders = Seq("SELECT", "FROM", "JOIN", "ON", "ORDER", "LIMIT",
      "UNION", "INTERSECT", "EXCEPT", "SETTINGS", "WINDOW", "QUALIFY",
      "FORMAT")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0; var inStr = false; var depth = 0
    var regionStart = -1; var regionDepth = -1
    def closeRegion(end: Int): Unit =
      if (regionStart >= 0) { out += ((regionStart, end)); regionStart = -1 }
    while (i < q.length) {
      val c = q.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') {
        depth -= 1
        if (regionStart >= 0 && depth < regionDepth) closeRegion(i)
        i += 1
      } else if ((Character.isLetter(c) || c == '_') &&
          (i == 0 || (!Character.isLetterOrDigit(q.charAt(i - 1)) &&
            q.charAt(i - 1) != '_'))) {
        var j = i
        while (j < q.length && (Character.isLetterOrDigit(q.charAt(j)) ||
          q.charAt(j) == '_')) j += 1
        val w = q.substring(i, j).toUpperCase
        if (starters.contains(w)) {
          closeRegion(i)
          regionStart = j; regionDepth = depth
        } else if (enders.contains(w) &&
            regionStart >= 0 && depth == regionDepth)
          closeRegion(i)
        i = j
      } else i += 1
    }
    closeRegion(q.length)
    out.toSeq
  }

  /** Qualify every standalone occurrence of `col` with `qual.` —
    * outside string literals, skipping already-qualified refs
    * (`x.col` / `col.x`), backticked names, and `AS col` alias
    * definitions — but ONLY in WHERE/PREWHERE/GROUP BY/HAVING context
    * (whereContextRanges). Used by the AMBIGUOUS_REFERENCE left-table
    * retry. */
  private[sqlfront] def qualifyBareColumn(
      q: String, col: String, qual: String): Option[String] = {
    val allowed = whereContextRanges(q)
    if (allowed.isEmpty) return None
    def inAllowed(p: Int): Boolean = allowed.exists(r => p >= r._1 && p < r._2)
    val sb = new StringBuilder
    var i = 0; var inStr = false; var changed = false
    while (i < q.length) {
      val c = q.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
      else if ((Character.isLetter(c) || c == '_') &&
          (i == 0 || (!Character.isLetterOrDigit(q.charAt(i - 1)) &&
            q.charAt(i - 1) != '_' && q.charAt(i - 1) != '.' &&
            q.charAt(i - 1) != '`')) &&
          q.regionMatches(false, i, col, 0, col.length) &&
          (i + col.length >= q.length ||
            (!Character.isLetterOrDigit(q.charAt(i + col.length)) &&
              q.charAt(i + col.length) != '_' &&
              q.charAt(i + col.length) != '`'))) {
        // skip `.` after (qualifier position) and a preceding AS
        var j = i + col.length
        while (j < q.length && Character.isWhitespace(q.charAt(j))) j += 1
        val followedByDot = j < q.length && q.charAt(j) == '.'
        var k = i - 1
        while (k >= 0 && Character.isWhitespace(q.charAt(k))) k -= 1
        val prevWordEnd = k
        while (k >= 0 && (Character.isLetterOrDigit(q.charAt(k)) ||
          q.charAt(k) == '_')) k -= 1
        val prevWord = q.substring(k + 1, prevWordEnd + 1)
        if (followedByDot || prevWord.equalsIgnoreCase("AS") ||
            !inAllowed(i)) {
          // NOT sb.append(q, i, j): the 3-arg overload auto-tuples
          sb.append(q.substring(i, i + col.length)); i += col.length
        } else {
          sb.append(qual).append('.').append(col)
          changed = true; i += col.length
        }
      } else { sb.append(c); i += 1 }
    }
    if (changed) Some(sb.toString) else None
  }

  /** Find `expr AS <alias>` in a select list and substitute `(expr)` for
    * every other standalone occurrence of the alias (outside string
    * literals, backticks, qualified refs and nested `(SELECT …)`
    * groups). Returns None when the alias has no such definition. */
  private[sqlfront] def expandSelectAliasRefs(
      q: String, alias: String): Option[String] = {
    val asRe = ("(?is)\\bAS\\s+`?" +
      java.util.regex.Pattern.quote(alias) + "`?(?![\\w])").r
    val m = asRe.findFirstMatchIn(q).getOrElse(return None)
    // walk back from the AS to the item start (previous top-level comma,
    // opening paren, or SELECT keyword)
    var i = m.start - 1
    var depth = 0
    var start = -1
    while (i >= 0 && start < 0) {
      q.charAt(i) match {
        case ')' => depth += 1
        case '(' => if (depth == 0) start = i + 1 else depth -= 1
        case ',' if depth == 0 => start = i + 1
        case c if (c == 't' || c == 'T') && depth == 0 &&
            i >= 5 && q.substring(i - 5, i + 1).equalsIgnoreCase("select") &&
            (i < 6 || !q.charAt(i - 6).isLetterOrDigit) =>
          start = i + 1
        case _ => ()
      }
      i -= 1
    }
    if (start < 0) return None
    val exprTxt = q.substring(start, m.start).trim
      .replaceAll("(?is)^(?:DISTINCT|ALL)\\s+", "")
    if (exprTxt.isEmpty || exprTxt.equalsIgnoreCase(alias)) return None
    // the alias is only visible inside ITS OWN select block — outer
    // occurrences are projected-column references and must keep the
    // name (00277: arr defined in a subquery, summed outside). Scope =
    // the innermost paren group containing the definition.
    val (scopeLo, scopeHi) = locally {
      var lo = 0; var hi = q.length
      val stack = scala.collection.mutable.Stack.empty[Int]
      var k = 0; var inS = false
      while (k < q.length) {
        val c = q.charAt(k)
        if (inS) { if (c == '\'') inS = false }
        else if (c == '\'') inS = true
        else if (c == '(') stack.push(k)
        else if (c == ')') {
          if (stack.nonEmpty) {
            val o = stack.pop()
            if (o < m.start && k > m.start && o >= lo && k <= hi) {
              lo = o + 1; hi = k
            }
          }
        }
        k += 1
      }
      (lo, hi)
    }
    // a generator alias (arrayJoin/explode) cannot be substituted into
    // scalar positions — leave the error to surface
    if ("(?i)\\b(arrayJoin|explode)\\s*\\(".r.findFirstIn(exprTxt).isDefined)
      return None
    val defEnd = m.end
    val sb = new StringBuilder
    var j = 0
    var changed = false
    while (j < q.length) {
      val c = q.charAt(j)
      if (c == '\'') {
        // copy a string literal verbatim (escape-aware)
        sb.append(c); j += 1
        var closed = false
        while (j < q.length && !closed) {
          val ch = q.charAt(j)
          sb.append(ch)
          if (ch == '\\' && j + 1 < q.length) { sb.append(q.charAt(j + 1)); j += 2 }
          else { if (ch == '\'') closed = true; j += 1 }
        }
      } else if (c == '`') {
        val e = q.indexOf('`', j + 1)
        val stop = if (e < 0) q.length else e + 1
        sb.append(q.substring(j, stop)); j = stop
      } else if (c.isLetter || c == '_') {
        val k0 = j
        while (j < q.length && (q.charAt(j).isLetterOrDigit || q.charAt(j) == '_')) j += 1
        val word = q.substring(k0, j)
        val prev = if (k0 == 0) ' ' else q.charAt(k0 - 1)
        val isDef = k0 >= m.start && k0 < defEnd
        // a re-definition elsewhere (`… AS alias`) must keep its name
        val afterAs = locally {
          var p = k0 - 1
          while (p >= 0 && q.charAt(p).isWhitespace) p -= 1
          p >= 1 && q.substring(math.max(0, p - 1), p + 1)
            .equalsIgnoreCase("as") &&
            (p < 2 || !q.charAt(p - 2).isLetterOrDigit)
        }
        if (word == alias && prev != '.' && !isDef && !afterAs &&
            k0 >= scopeLo && k0 < scopeHi) {
          sb.append('(').append(exprTxt).append(')'); changed = true
        } else sb.append(word)
      } else { sb.append(c); j += 1 }
    }
    if (changed) Some(sb.toString) else None
  }

  /** `SELECT … arrayJoin(e) AS w … WHERE f(w)`: CH filters AFTER the
    * array expansion. A generator alias can't be substituted into the
    * WHERE — wrap instead: `SELECT * FROM (select-without-where) WHERE
    * f(w)`. Only the simple shape (top-level WHERE, nothing after the
    * predicate) is handled — enough for the fill-query family. */
  private[sqlfront] def wrapGeneratorWhere(
      q: String, alias: String): Option[String] = {
    if (!"(?is)^\\s*SELECT\\b".r.findFirstIn(q).isDefined) return None
    val asRe = ("(?is)\\b(?:arrayJoin|explode)\\s*\\((?:[^()]|\\([^()]*\\))*\\)" +
      "\\s+AS\\s+`?" + java.util.regex.Pattern.quote(alias) + "`?(?![\\w])").r
    if (asRe.findFirstIn(q).isEmpty) return None
    // locate the top-level WHERE (quote/paren aware)
    var i = 0; var depth = 0; var inStr = false; var whereAt = -1
    while (i < q.length && whereAt < 0) {
      val c = q.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == 'w' || c == 'W') &&
          i + 5 <= q.length &&
          q.substring(i, i + 5).equalsIgnoreCase("where") &&
          (i == 0 || !q.charAt(i - 1).isLetterOrDigit) &&
          (i + 5 == q.length || !q.charAt(i + 5).isLetterOrDigit))
        whereAt = i
      i += 1
    }
    if (whereAt < 0) return None
    val predAll = q.substring(whereAt + 5).trim.stripSuffix(";").trim
    // ORDER BY / LIMIT after the predicate move OUTSIDE the wrap;
    // GROUP BY / HAVING / set ops bail (the filter's position matters)
    val tailKw = ("(?i)\\b(ORDER\\s+BY|LIMIT|SETTINGS|FORMAT)\\b").r
      .findFirstMatchIn(predAll)
    val (pred, suffix) = tailKw match {
      case Some(mm) => (predAll.take(mm.start).trim,
        " " + predAll.substring(mm.start).trim)
      case None => (predAll, "")
    }
    if (pred.isEmpty ||
        ("(?i)\\b(GROUP\\s+BY|HAVING|UNION|INTERSECT|" +
          "EXCEPT|WINDOW)\\b").r.findFirstIn(pred).isDefined ||
        !("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(alias) +
          "\\b").r.findFirstIn(pred).isDefined)
      return None
    Some(s"SELECT * FROM (${q.substring(0, whereAt).trim}) WHERE $pred$suffix")
  }

  def sql(spark: SparkSession, dir: String, chQuery0: String): DataFrame = {
    // Flag the session as dialect-routed for the duration of query
    // CONSTRUCTION (DataFrames analyze eagerly, so the CH-semantics
    // resolution rules — truthiness, Float32-literal compare — fire
    // exactly on this query's analysis). Save/restore keeps nested
    // sql() calls (views, subquery expansion) and the flag-off default
    // for DataFrame-path queries intact.
    val prev = spark.conf.getOption(graft.plans.ChDialect.key)
    spark.conf.set(graft.plans.ChDialect.key, "true")
    // CH count() is parameterless — allow Spark's legacy spelling once
    spark.conf.set("spark.sql.legacy.allowParameterlessCount", "true")
    // explicit NULLS FIRST/LAST in the text: the default-nulls flip
    // (ChNullsOrdering) must not touch this query's sorts
    val nKey = graft.plans.ChNullsOrdering.skipKey
    val prevN = spark.conf.getOption(nKey)
    spark.conf.set(nKey,
      "(?i)\\bNULLS\\s+(FIRST|LAST)\\b".r.findFirstIn(chQuery0).isDefined.toString)
    checkFunctionArity(chQuery0)
    // CH resolves SELECT-list aliases inside WHERE/PREWHERE/GROUP BY/
    // HAVING of the same query (reference QueryNormalizer alias
    // substitution — `SELECT f(x) AS w ... WHERE w > 0`). Spark doesn't:
    // on an unresolved-column error naming a SELECT alias, substitute
    // the alias expression textually and retry (bounded for the chained
    // alias case, 00988).
    def run(q: String, depth: Int): DataFrame =
      try sqlImpl(spark, dir, q)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if depth < 8 && e.getMessage != null &&
              e.getMessage.contains("UNRESOLVED_COLUMN") =>
          val nm = "with name `([^`]+)`".r.findFirstMatchIn(e.getMessage)
            .map(_.group(1))
          nm.flatMap(n => expandSelectAliasRefs(q, n)
            .orElse(wrapGeneratorWhere(q, n))) match {
            case Some(q2) if q2 != q => run(q2, depth + 1)
            case _ => throw e
          }
        // CH resolves a bare column present on BOTH join sides to the
        // LEFT table (reference IdentifierSemantic membership order;
        // joins_in_memory.xml `WHERE i32 = …` after JOIN USING i64).
        // Spark throws — qualify the bare occurrences with the first
        // FROM relation's alias and retry.
        case e: org.apache.spark.sql.AnalysisException
            if depth < 8 && e.getMessage != null &&
              e.getMessage.contains("AMBIGUOUS_REFERENCE") =>
          val msg = e.getMessage
          val nm = "Reference `([^`]+)` is ambiguous".r
            .findFirstMatchIn(msg).map(_.group(1))
          val cands = "could be: \\[([^\\]]*)\\]".r.findFirstMatchIn(msg)
            .map(_.group(1)).map(_.split(",").toSeq.map(_.trim))
            .getOrElse(Seq.empty)
            .flatMap(c => "`([^`]+)`\\.`[^`]+`".r.findFirstMatchIn(c)
              .map(_.group(1)))
          nm.flatMap { n =>
            val fromAlias =
              ("(?is)\\bFROM\\s+[\\w.`()]+\\s+(?:AS\\s+)?([A-Za-z_]\\w*)\\b")
                .r.findFirstMatchIn(q).map(_.group(1))
            val qual = fromAlias.filter(cands.contains)
              .orElse(cands.headOption)
            qual.flatMap(qualifyBareColumn(q, n, _))
          } match {
            case Some(q2) if q2 != q => run(q2, depth + 1)
            case _ => throw e
          }
      }
    try run(chQuery0, 0)
    finally {
      prev match {
        case Some(v) => spark.conf.set(graft.plans.ChDialect.key, v)
        case None => spark.conf.unset(graft.plans.ChDialect.key)
      }
      prevN match {
        case Some(v) => spark.conf.set(nKey, v)
        case None => spark.conf.unset(nKey)
      }
    }
  }

  /** GROUP-BY key names of the last statement's WITH TOTALS clause
    * (simple identifiers only) — consumed by the anchor runner to render
    * the reference's totals block. Reset per statement. THREAD-LOCAL:
    * anchor ranges run in parallel inside one JVM, so shared mutable
    * state here would race across concurrently-running statements. */
  private val _lastTotalsKeys = new ThreadLocal[Option[Seq[String]]] {
    override def initialValue: Option[Seq[String]] = None
  }
  def lastTotalsKeys: Option[Seq[String]] = _lastTotalsKeys.get
  def lastTotalsKeys_=(v: Option[Seq[String]]): Unit = _lastTotalsKeys.set(v)

  /** When true (set by the anchor runner), the WITH TOTALS rewrite
    * appends a `grouping(firstKey) AS __totals_mark` column so the
    * totals row is identified by the grouping flag rather than by
    * all-NULL-keys inference (which misfires on nullable keys).
    * THREAD-LOCAL for the same reason: the runner's retry path toggles
    * it off and back on around a re-run. */
  private val _emitTotalsMarker = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }
  def emitTotalsMarker: Boolean = _emitTotalsMarker.get
  def emitTotalsMarker_=(v: Boolean): Unit = _emitTotalsMarker.set(v)

  /** DateTime64 render-scale hint for the anchor runner: a timestamp
    * output column renders with exactly N fractional digits when the
    * statement spells toDateTime64(..., N ...) or a registered table
    * declares the column as DateTime64(N). Plain DateTime prints none. */
  def dt64ScaleHint(colName: String, stmtText: String): Option[Int] = {
    val inStmt = ("(?is)toDateTime64(?:OrNull|OrZero|OrDefault)?\\s*\\(" +
      "(?:[^()]|\\([^()]*\\))*?,\\s*(\\d+)").r
      .findFirstMatchIn(stmtText).map(_.group(1).toInt)
      // type-spelling forms: x::DateTime64(3), CAST(x AS DateTime64(3))
      .orElse("(?i)DateTime64\\s*\\(\\s*(\\d+)".r
        .findFirstMatchIn(stmtText).map(_.group(1).toInt))
    inStmt.orElse {
      tableColMeta.values.flatMap(_.collectFirst {
        case (n, ty, _, _) if n == colName &&
            ty.matches("(?i).*DateTime64\\b.*") =>
          "(?i)DateTime64\\s*\\(\\s*(\\d+)".r
            .findFirstMatchIn(ty).map(_.group(1).toInt)
            .getOrElse(3) // DateTime64 defaults to scale 3
      }).headOption
    }.map(n => math.min(n, 9))
  }

  /** Recognized semantic settings from the anchor runner's SET
    * statements (applied in statement order; resetSessionState restores
    * the per-test defaults). Unrecognized names stay absorbed, matching
    * the per-query SETTINGS-tail policy. */
  def applyAnchorSetting(spark: SparkSession, name: String, value0: String): Unit = {
    // SET name = DEFAULT restores the built-in default and clears the
    // changed flag (reference SettingsConstraints 02458)
    if (value0.trim.equalsIgnoreCase("default")) {
      recordedSettings.remove(name.toLowerCase)
      return
    }
    val value = value0.trim.stripPrefix("'").stripSuffix("'")
    // compatibility must be a dotted version string (reference
    // Settings::applyCompatibilitySetting throws BAD_ARGUMENTS)
    if (name.equalsIgnoreCase("compatibility") && value.nonEmpty &&
        !value.matches("\\d+(\\.\\d+)*"))
      throw new IllegalArgumentException(
        s"BAD_ARGUMENTS: Unable to parse compatibility setting value '$value'")
    // unsigned settings reject negative values (CANNOT_CONVERT_TYPE,
    // 02992); these sizes must be non-zero (BAD_ARGUMENTS, 03393/03405)
    if (value.startsWith("-") &&
        Set("max_threads", "max_block_size", "max_insert_block_size",
          "max_read_buffer_size", "max_rows_to_read")
          .contains(name.toLowerCase))
      throw new IllegalArgumentException(
        s"CANNOT_CONVERT_TYPE: cannot convert '$value' to unsigned setting $name")
    if (value == "0" &&
        Set("max_read_buffer_size", "output_format_parquet_batch_size")
          .contains(name.toLowerCase))
      throw new IllegalArgumentException(
        s"BAD_ARGUMENTS: setting $name must be non-zero")
    recordedSettings.put(name.toLowerCase, value0.trim)
    val on = value == "1" || value.equalsIgnoreCase("true")
    name.toLowerCase match {
      case "join_use_nulls" =>
        spark.conf.set("spark.graft.chJoinDefaults", (!on).toString)
      case "aggregate_functions_null_for_empty" =>
        spark.conf.set("spark.graft.chAggNullForEmpty", on.toString)
      case "empty_result_for_aggregation_by_empty_set" =>
        spark.conf.set("spark.graft.chEmptyResultEmptySet", on.toString)
      case "output_format_json_escape_forward_slashes" =>
        spark.conf.set("spark.graft.jsonEscapeSlash", on.toString)
      case "output_format_json_quote_64bit_integers" =>
        spark.conf.set("spark.graft.jsonQuote64", on.toString)
      case _ => ()
    }
  }

  private def sqlImpl(spark: SparkSession, dir: String, chQuery0: String): DataFrame = {
    lastTotalsKeys = None
    // clickhouse-test macros: {CLICKHOUSE_DATABASE:Identifier} expands to
    // the per-test database, here always `default`; the String form is
    // quoted. `default.`-qualified names then collapse to bare view names
    // (the session catalog is single-database).
    val chQuery1 = locally {
      val q1 = chQuery0
        .replaceAll("\\{CLICKHOUSE_DATABASE(?:_\\w+)?:String\\}", "'default'")
        .replaceAll("\\{CLICKHOUSE_DATABASE(?:_\\w+)?(?::\\w+)?\\}", "default")
      if (!q1.toLowerCase.contains("default.")) q1
      else { // quote-aware: never strip inside string literals
        val re = "(?i)(?<![\\w.`])default\\.(?=[A-Za-z_`])".r
        val sb = new StringBuilder; var last = 0
        for (m <- re.findAllMatchIn(q1)) {
          val inStr = q1.substring(0, m.start).count(_ == '\'') % 2 == 1
          sb.append(q1.substring(last, m.start))
          if (inStr) sb.append(m.matched)
          last = m.end
        }
        sb.append(q1.substring(last)); sb.toString
      }
    }
    // session tables with names Spark can't parse unquoted (03130_test)
    // were registered under a safe alias — substitute before anything
    // else sees the text
    val chQuery0a = rewriteGenerateRandom(
      tableAliases.foldLeft(chQuery1) { case (q, (ch, alias)) =>
        q.replaceAll("(?<![\\w`])" + java.util.regex.Pattern.quote(ch) + "\\b", alias)
      })
    // system.parts / parts_columns and the MergeTree row virtuals
    // (_part family): substitute EARLY so the `*`-expansion below sees
    // the final table names and their hidden-column sets
    val chQuery0a2 = locally {
      var qq = chQuery0a
      if ("(?i)\\bsystem\\.(parts|parts_columns|detached_parts)\\b".r
          .findFirstIn(qq).isDefined) {
        ChParts.buildViews(spark, t =>
          tableColMeta.get(t).map(_.map(c => (c._1, c._2))).getOrElse(
            if (spark.catalog.tableExists(t))
              spark.table(t).schema.fields.toSeq
                .map(f => (f.name, f.dataType.simpleString))
            else Seq.empty),
          t => sparseKindsFor(spark, t))
        hiddenInsertCols.put("system_parts",
          Set("_state", "part_name", "bytes"))
        import spark.implicits._
        if (!spark.catalog.tableExists("system_detached_parts"))
          Seq.empty[(String, String, String)]
            .toDF("database", "table", "name")
            .createOrReplaceTempView("system_detached_parts")
        qq = qq
          .replaceAll("(?i)\\bsystem\\.parts_columns\\b", "system_parts_columns")
          .replaceAll("(?i)\\bsystem\\.detached_parts\\b", "system_detached_parts")
          .replaceAll("(?i)\\bsystem\\.parts\\b", "system_parts")
      }
      if ("(?i)\\bsystem\\.settings\\b".r.findFirstIn(qq).isDefined) {
        import spark.implicits._
        settingsRows().toDF("name", "value", "changed", "description",
          "min", "max", "readonly", "type", "default", "alias_for",
          "is_obsolete", "tier")
          .createOrReplaceTempView("system_settings")
        qq = qq.replaceAll("(?i)\\bsystem\\.settings\\b", "system_settings")
      }
      if ("(?i)\\bsystem\\.merge_tree_settings\\b".r.findFirstIn(qq).isDefined) {
        import spark.implicits._
        Seq(
          ("index_granularity", "8192", 0, "How many rows correspond to one primary key value.", "\\N", "\\N", 0, "UInt64", "8192", "", 0, "Production"),
          ("adaptive_index_granularity_bytes", "10485760", 0, "Approximate amount of bytes in single granule.", "\\N", "\\N", 0, "UInt64", "10485760", "", 0, "Production"),
          ("enable_block_number_column", "0", 0, "Enable persisting column _block_number for each row.", "\\N", "\\N", 0, "Bool", "0", "", 0, "Beta"),
          ("allow_experimental_replacing_merge_with_cleanup", "0", 0, "Allow experimental CLEANUP merges.", "\\N", "\\N", 0, "Bool", "0", "", 0, "Experimental"),
          ("kill_threads", "128", 0, "Obsolete setting, does nothing.", "\\N", "\\N", 0, "UInt64", "128", "", 1, "Obsolete"))
          .toDF("name", "value", "changed", "description", "min", "max",
            "readonly", "type", "default", "alias_for", "is_obsolete", "tier")
          .createOrReplaceTempView("system_merge_tree_settings")
        qq = qq.replaceAll("(?i)\\bsystem\\.merge_tree_settings\\b",
          "system_merge_tree_settings")
      }
      if ("(?i)\\bsystem\\.data_skipping_indices\\b".r.findFirstIn(qq).isDefined) {
        import spark.implicits._
        val idxRows = tableIndexes.toSeq.sortBy(_._1).flatMap { case (t, idxs) =>
          idxs.map { case (inm, idef) =>
            val tpe = "(?i)\\bTYPE\\s+(\\w+)".r.findFirstMatchIn(idef)
              .map(_.group(1)).getOrElse("")
            val tpeFull = ("(?i)\\bTYPE\\s+(\\w+(?:\\((?:[^()]|\\([^()]*\\))*\\))?)").r
              .findFirstMatchIn(idef).map(_.group(1)).getOrElse(tpe)
            val expr = "(?is)^(.*?)\\s+TYPE\\b".r.findFirstMatchIn(idef)
              .map(_.group(1)).getOrElse("")
            val gran = "(?i)\\bGRANULARITY\\s+(\\d+)".r.findFirstMatchIn(idef)
              .map(_.group(1).toLong).getOrElse(1L)
            ("default", tableAliases.collectFirst {
              case (o, m) if m == t => o }.getOrElse(t),
              inm, tpe, tpeFull, expr, gran, 0L, 0L, 0L)
          }
        }
        idxRows.toDF("database", "table", "name", "type", "type_full",
          "expr", "granularity", "data_compressed_bytes",
          "data_uncompressed_bytes", "marks")
          .createOrReplaceTempView("system_data_skipping_indices")
        qq = qq.replaceAll("(?i)\\bsystem\\.data_skipping_indices\\b",
          "system_data_skipping_indices")
      }
      if ("(?i)\\bsystem\\.macros\\b".r.findFirstIn(qq).isDefined) {
        import spark.implicits._
        testMacros.toSeq.sortBy(_._1).toDF("macro", "substitution")
          .createOrReplaceTempView("system_macros")
        qq = qq.replaceAll("(?i)\\bsystem\\.macros\\b", "system_macros")
      }
      // File-engine virtual columns _file/_path (reference StorageFile
      // virtual columns — one data.<Format> file per table here)
      if ("(?<![\\w])_(?:file|path)\\b".r.findFirstIn(qq).isDefined) {
        for (mm <- "(?i)\\b(?:FROM|JOIN)\\s+`?(\\w+)`?".r
               .findAllMatchIn(qq).toSeq;
             tail <- tableDdlTail.get(mm.group(1));
             fm <- "(?i)\\bENGINE\\s*=?\\s*File\\s*\\(\\s*([\\w]+)".r
               .findFirstMatchIn(tail)) {
          val fmt = fm.group(1)
          qq = qq.replaceAll("(?<![\\w])_file\\b", s"'data.$fmt'")
          qq = qq.replaceAll("(?<![\\w])_path\\b",
            s"'/var/lib/clickhouse/data/default/${mm.group(1)}/data.$fmt'")
        }
      }
      if (virtualShadow.nonEmpty && virtualColNames.exists(c =>
          ("(?<![\\w])" + c + "\\b").r.findFirstIn(qq).isDefined) &&
          "(?is)^\\s*(INSERT|CREATE|ALTER|DROP|TRUNCATE|OPTIMIZE|DELETE)\\b".r
            .findFirstIn(qq).isEmpty) {
        for ((t, sh) <- virtualShadow
             if ("(?i)\\b(FROM|JOIN)\\s+`?" + t + "`?(?![\\w.])").r
               .findFirstIn(qq).isDefined) {
          // schema drift (ALTER since the last insert) disables routing
          val mainCols = spark.table(t).columns.toSet
          if ((sh.columns.toSet -- virtualColNames) == mainCols) {
            sh.createOrReplaceTempView("__vt_" + t)
            hiddenInsertCols.put("__vt_" + t, virtualColNames.toSet)
            qq = ("(?i)\\b(FROM|JOIN)(\\s+)`?" + t + "`?(?![\\w.])").r
              .replaceAllIn(qq, mm => mm.group(1) + mm.group(2) + "__vt_" + t)
          }
        }
      }
      qq
    }
    // SELECT * omits MATERIALIZED/ALIAS columns (reference
    // ColumnsDescription::getOrdinary drives the asterisk expansion).
    // Runs BEFORE remote() shard expansion so the generated per-shard
    // SELECT * keeps the full table (ALIAS columns stay addressable
    // through the expansion, 02494 shape).
    val chQuery0s =
      if (hiddenInsertCols.isEmpty || !chQuery0a2.contains("*")) chQuery0a2
      else "(?is)\\bSELECT\\s+\\*\\s+FROM\\s+(\\w+)".r.replaceAllIn(chQuery0a2, m => {
        val tbl = m.group(1)
        val hidden = hiddenInsertCols.getOrElse(tbl, Set.empty)
        // only expand a SINGLE-TABLE star: a JOIN / comma / alias after
        // the table means other relations contribute columns too, and
        // expanding to t's columns alone would silently drop theirs
        val rest = m.after.toString.dropWhile(_.isWhitespace)
        val singleTable = rest.isEmpty || rest.head == ';' || rest.head == ')' ||
          ("(?is)^(WHERE|PREWHERE|GROUP|ORDER|HAVING|LIMIT|OFFSET|SETTINGS|" +
            "FORMAT|UNION|EXCEPT|INTERSECT|QUALIFY|WINDOW|SAMPLE|FINAL)\\b").r
            .findFirstIn(rest).nonEmpty
        if (!singleTable || hidden.isEmpty || !tbl.matches("[A-Za-z_]\\w*") ||
            !spark.catalog.tableExists(tbl)) m.matched
        else {
          val vis = spark.table(tbl).columns.filterNot(hidden)
            .map(x => s"`$x`").mkString(", ")
          java.util.regex.Matcher.quoteReplacement(s"SELECT $vis FROM $tbl")
        }
      })
    // `SELECT *, extra FROM t` — the star still expands to the ordinary
    // (non-MATERIALIZED/ALIAS) columns, extras stay (00079)
    val chQuery0s2 =
      if (hiddenInsertCols.isEmpty || !chQuery0s.contains("*")) chQuery0s
      else "(?is)\\bSELECT\\s+\\*\\s*,\\s*([\\w, `()%]+?)\\s+FROM\\s+(\\w+)".r
        .replaceAllIn(chQuery0s, m => {
          val (extras, tbl) = (m.group(1), m.group(2))
          val hidden = hiddenInsertCols.getOrElse(tbl, Set.empty)
          if (hidden.isEmpty || !tbl.matches("[A-Za-z_]\\w*") ||
              !spark.catalog.tableExists(tbl)) m.matched
          else {
            val vis = spark.table(tbl).columns.filterNot(hidden)
              .map(x => s"`$x`").mkString(", ")
            java.util.regex.Matcher.quoteReplacement(
              s"SELECT $vis, $extras FROM $tbl")
          }
        })
    val chQuery0b = rewriteRemoteCluster(chQuery0s2)
    // SELECT ... FROM t FINAL over an engine-family table reads the
    // MERGED view (reference SELECT ... FINAL): substitute a finalized
    // temp view; tables without engine metadata keep the plain strip in
    // rewrite(). OPTIMIZE/ALTER spell FINAL as a merge hint — skip them.
    val chQueryF =
      if (!"(?is)^\\s*(OPTIMIZE|ALTER)\\b".r.findFirstIn(chQuery0b).isEmpty ||
          !"(?i)\\bFINAL\\b".r.findFirstIn(chQuery0b).isDefined) chQuery0b
      else "(?i)(\\w+)(\\s+)FINAL\\b".r.replaceAllIn(chQuery0b, m => {
        val tbl = m.group(1)
        if (tableEngines.contains(tbl))
          engineFinalDf(spark, tbl) match {
            case Some(d) =>
              d.createOrReplaceTempView(tbl + "__final")
              java.util.regex.Matcher.quoteReplacement(tbl + "__final")
            case None => m.matched
          }
        else m.matched
      })
    // [LEFT] ARRAY JOIN clauses materialize to exploded temp views
    val chQueryA = rewriteArrayJoin(spark, dir, chQueryF)
    // dotted Nested sub-column names parse as struct access unless
    // backtick-quoted — quote every known flattened name
    val chQueryQ = if (nestedColNames.isEmpty) chQueryA else {
      var qn = chQueryA
      nestedColNames.forEach { n =>
        qn = qn.replaceAll(
          "(?<![\\w`.])" + java.util.regex.Pattern.quote(n) + "(?![\\w`])",
          java.util.regex.Matcher.quoteReplacement(s"`$n`"))
      }
      qn
    }
    val chQuery = chQueryQ
    Tables.registerAll(spark, dir)
    // dictionaries are SELECTable as tables in the reference
    // (StorageDictionary) — alias the source table under the dict name
    for ((dn, (src, _)) <- registeredDicts
         if ("(?i)(?<![\\w.`])" + java.util.regex.Pattern.quote(dn) + "(?![\\w`])")
           .r.findFirstIn(chQuery).isDefined &&
           !spark.catalog.tableExists(dn) && spark.catalog.tableExists(src))
      spark.table(src).createOrReplaceTempView(dn)
    // ONE partition: the reference's system.numbers streams sequentially,
    // so LIMIT n must yield 0..n-1 — a multi-partition range hands
    // LocalLimit rows from EVERY partition (numbers near 10^8), which
    // both diverges and blows up downstream per-row allocations
    // (00198-class: range(x) over a limited scan). Built once per
    // session (sessionViewsReady); resetSessionState clears the flag.
    if (sessionViewsReady.add(spark)) {
      spark.range(0, 100000000L, 1, 1).toDF("number")
        .createOrReplaceTempView("system_numbers")
      spark.range(0, 1).toDF("dummy").createOrReplaceTempView("system_one")
    }
    // system.tables / system.columns introspection (reference
    // src/Storages/System/StorageSystemTables.cpp, StorageSystemColumns.cpp):
    // one row per registered view; columns enumerated from each schema.
    // Built lazily — catalog enumeration only when the query asks for it.
    if ("(?i)system\\.(tables|columns)".r.findFirstIn(chQuery).nonEmpty) {
      import spark.implicits._
      val names = spark.catalog.listTables().collect()
        .map(_.name).filter(n => n != "system_tables" && n != "system_columns" &&
          !n.startsWith("system_parts") && n != "system_detached_parts" &&
          !n.startsWith("__vt_"))
        .sorted
      names.toSeq.map(n => ("default", n)).toDF("database", "name")
        .createOrReplaceTempView("system_tables")
      names.toSeq.flatMap { t =>
        spark.table(t).schema.fields.zipWithIndex.map { case (f, i) =>
          ("default", t, f.name, i + 1, f.dataType.simpleString)
        }
      }.toDF("database", "table", "name", "position", "type")
        .createOrReplaceTempView("system_columns")
    }

    // ---- DDL / DML surface (reference src/Parsers/ParserCreateQuery.cpp,
    // ParserInsertQuery.cpp; SURVEY §3.2). Session-scoped tables as temp
    // views; ENGINE/ORDER BY/PARTITION BY clauses are storage hints our
    // layout ops own (Layout.writeBucketed/compact), absorbed here.
    val createRe =
      "(?is)^\\s*CREATE\\s+(?:TEMPORARY\\s+)?(TABLE|VIEW|MATERIALIZED\\s+VIEW)\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\w+)(.*?)\\bAS\\b\\s+((?:SELECT|WITH)\\b.*)$".r
    // CREATE TABLE x AS y [ENGINE = E(...)]: schema clone of a registered
    // table (reference ParserCreateQuery "AS table" form). A Buffer(db,
    // tbl) engine writes THROUGH to the underlying table — alias the new
    // name so inserts/reads hit the target (flushes are transparent).
    val createAsTableRe =
      ("(?is)^\\s*CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
        "([\\w.]+)\\s+AS\\s+([\\w.]+)\\s*(?:ENGINE\\s*=?\\s*(\\w+)\\s*(?:\\(((?:[^()]|\\([^()]*\\))*)\\))?)?\\s*" +
        "((?:PARTITION\\s+BY|PRIMARY\\s+KEY|ORDER\\s+BY|SAMPLE\\s+BY|TTL\\b|SETTINGS|COMMENT)\\b.*?)?;?\\s*$").r
    // `CREATE TABLE t ENGINE = X(...) AS src` — same clone, ENGINE first
    // (count_from_formats.xml File-engine clones)
    val createEngineAsTableRe =
      ("(?is)^\\s*CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
        "([\\w.]+)\\s+(ENGINE\\s*=?\\s*\\w+\\s*(?:\\(((?:[^()]|\\([^()]*\\))*)\\))?)\\s*" +
        "AS\\s+([\\w.]+)\\s*;?\\s*$").r
    // CREATE/DROP DATABASE and USE: the session catalog is single-
    // database (every `{CLICKHOUSE_DATABASE*}` macro collapses to
    // `default`), so database DDL is a no-op surface
    val createDbRe = "(?is)^\\s*CREATE\\s+DATABASE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?[\\w.]+\\s*(?:ENGINE\\s*=?\\s*\\w+(?:\\([^)]*\\))?)?\\s*;?\\s*$".r
    val dropDbRe = "(?is)^\\s*DROP\\s+DATABASE\\s+(?:IF\\s+EXISTS\\s+)?[\\w.]+(?:\\s+SYNC)?\\s*;?\\s*$".r
    val useRe = "(?is)^\\s*USE\\s+[\\w.]+\\s*;?\\s*$".r
    val dropRe = "(?is)^\\s*DROP\\s+(?:TEMPORARY\\s+)?(?:TABLE|VIEW)\\s+(?:IF\\s+EXISTS\\s+)?(`[^`]+`|\\w+)(?:\\s+SYNC)?\\s*;?\\s*$".r
    // a backtick-quoted name; `.inner.X` is an MV's storage table —
    // aliased to the MV itself (reference StorageMaterializedView inner
    // table naming)
    def unqName(n: String): String = {
      val s = n.stripPrefix("`").stripSuffix("`")
      if (s.startsWith(".inner.")) s.stripPrefix(".inner.") else s
    }
    // SYSTEM commands (STOP MERGES / FLUSH LOGS / RELOAD ... — reference
    // InterpreterSystemQuery.cpp) tune server state that has no analog
    // here: all no-ops
    val systemRe = "(?is)^\\s*SYSTEM\\s+\\w+.*$".r
    // optional (col, ...) target list (reference ParserInsertQuery.cpp):
    // unlisted columns fill from declared DEFAULT/MATERIALIZED exprs
    val insertSelRe =
      "(?is)^\\s*INSERT\\s+INTO\\s+(?:TABLE\\s+)?(\\w+)\\s*(?:\\(([\\w`.,\\s]*)\\)\\s*)?((?:SELECT|WITH)\\b.*)$".r
    val insertValRe =
      "(?is)^\\s*INSERT\\s+INTO\\s+(?:TABLE\\s+)?(\\w+)\\s*(?:\\(([\\w`.,\\s]*)\\)\\s*)?VALUES\\s*(.*)$".r
    val insertFmtRe =
      "(?is)^\\s*INSERT\\s+INTO\\s+(?:TABLE\\s+)?(\\w+)\\s*(?:\\(([\\w`.,\\s]*)\\)\\s*)?FORMAT\\s+(\\w+)\\s*(.*)$".r
    // lightweight mutations on session tables (reference
    // MutationsInterpreter.cpp; parquet-backed tables use ops.Mutations)
    val alterDelRe = "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+DELETE\\s+WHERE\\s+(.*?);?\\s*$".r
    val alterUpdRe = "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+UPDATE\\s+(.*?)\\s+WHERE\\s+(.*?);?\\s*$".r
    // schema mutations (reference AlterCommands.cpp ADD/DROP/RENAME
    // COLUMN; InterpreterRenameQuery.cpp RENAME TABLE). The declared type
    // is accepted and ignored — the DEFAULT expression's type governs, as
    // for session tables generally.
    val alterAddColRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+ADD\\s+COLUMN\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
        "(`[^`]+`|[\\w.]+)\\s+([\\w()0-9,'= ]+?)(?:\\s+(?:DEFAULT|(MATERIALIZED)|ALIAS)\\s+(.*?))?" +
        "(?:\\s+AFTER\\s+(`[^`]+`|[\\w.]+))?;?\\s*$").r
    val alterDropColRe =
      "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+DROP\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?(`[^`]+`|[\\w.]+);?\\s*$".r
    // CH ALTER takes a COMMA-SEPARATED action list — split into
    // sequential single-action statements (reference AlterCommands)
    val alterMultiRe =
      "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+(.*,\\s*(?:ADD|DROP|MODIFY|RENAME|CLEAR|COMMENT)\\s+COLUMN\\b.*)$".r
    val alterRenColRe =
      "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+RENAME\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?(\\w+)\\s+TO\\s+(\\w+);?\\s*$".r
    val alterModColRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+MODIFY\\s+COLUMN\\s+(IF\\s+EXISTS\\s+)?" +
        "(\\w+)\\s+([\\w()0-9,'= ]+?)(?:\\s+DEFAULT\\s+(.*?))?;?\\s*$").r
    // MODIFY COLUMN name DEFAULT expr (no type): only the default
    // expression changes — existing rows keep their values
    val alterModDefRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+MODIFY\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?" +
        "(`[^`]+`|[\\w.]+)\\s+(DEFAULT|MATERIALIZED|ALIAS)\\s+(.*?);?\\s*$").r
    val alterClearColRe =
      "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+CLEAR\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?(\\w+).*$".r
    // skip-index / projection / constraint / per-table-setting actions
    // are storage-layout performance hints in the reference
    // (MergeTreeIndices, ProjectionsDescription) — results are identical
    // without them, so they are accepted and absorbed
    val alterHintRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+" +
        "(?:ADD|DROP|MATERIALIZE|CLEAR)\\s+(?:INDEX|PROJECTION|CONSTRAINT|STATISTICS?)\\b.*$").r
    val alterSettingRe =
      "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+(?:MODIFY|RESET)\\s+SETTINGS?\\b.*$".r
    val alterCommentColRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+COMMENT\\s+COLUMN\\s+" +
        "(?:IF\\s+EXISTS\\s+)?(`[^`]+`|[\\w.]+)\\s+'((?:[^'\\\\]|\\\\.)*)'\\s*;?\\s*$").r
    // MODIFY COLUMN col REMOVE DEFAULT/MATERIALIZED/ALIAS/CODEC/COMMENT/TTL
    // strips ONE property, keeping the column (reference AlterCommands
    // REMOVE_PROPERTY)
    val alterRemovePropRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+MODIFY\\s+COLUMN\\s+" +
        "(?:IF\\s+EXISTS\\s+)?(`[^`]+`|[\\w.]+)\\s+REMOVE\\s+" +
        "(DEFAULT|MATERIALIZED|ALIAS|CODEC|COMMENT|TTL)\\s*;?\\s*$").r
    val renameTableRe =
      "(?is)^\\s*RENAME\\s+TABLE\\s+(\\w+)\\s+TO\\s+(\\w+);?\\s*$".r
    // TABLE keyword is optional in the reference (ParserTruncateQuery)
    val truncateRe =
      "(?is)^\\s*TRUNCATE\\s+(?:TABLE\\s+)?(?:IF\\s+EXISTS\\s+)?(\\w+)\\s*;?\\s*$".r
    // OPTIMIZE ... DEDUPLICATE [BY col, ...] has real row-dropping
    // semantics (reference InterpreterOptimizeQuery.cpp / MergeTree
    // DEDUPLICATE merges): full-row distinct, or first-row-per-key when a
    // BY list is given. Plain OPTIMIZE stays a no-op (no parts here).
    val optimizeDedupRe =
      "(?is)^\\s*OPTIMIZE\\s+TABLE\\s+(\\w+)\\s+(?:FINAL\\s+)?DEDUPLICATE(?:\\s+BY\\s+(.+?))?\\s*;?\\s*$".r
    val optimizeRe = "(?is)^\\s*OPTIMIZE\\s+TABLE\\s+(\\w+).*$".r
    // CREATE DICTIONARY d (...) PRIMARY KEY k SOURCE(...(TABLE 't'...)...)
    // (reference src/Storages/StorageDictionary.h / getDictionaryConfigurationFromAST):
    // attribute list and LAYOUT/LIFETIME clauses are accepted and ignored
    // (every table here is an in-memory view — the hashed layout analog).
    val createDictRe = ("(?is)^\\s*CREATE\\s+DICTIONARY\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\w+)" +
      ".*?PRIMARY\\s+KEY\\s+(\\w+).*?TABLE\\s+'?(\\w+)'?.*$").r
    val dropDictRe =
      "(?is)^\\s*DROP\\s+DICTIONARY\\s+(IF\\s+EXISTS\\s+)?([\\w.]+)(?:\\s+SYNC)?\\s*;?\\s*$".r
    // mutation bookkeeping / access-control DDL: no async mutation queue
    // and no access entities exist in this engine — absorbed
    // (reference InterpreterKillQueryQuery / Access/RowPolicy)
    val killMutationRe = "(?is)^\\s*KILL\\s+MUTATION\\b.*$".r
    val rowPolicyRe =
      "(?is)^\\s*(?:CREATE|DROP|ALTER)\\s+ROW\\s+POLICY\\b.*$".r
    val modifyTtlRe =
      "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+MODIFY\\s+TTL\\s+(.+?);?\\s*$".r
    val removeTtlRe =
      "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+REMOVE\\s+TTL\\s*;?\\s*$".r
    // interactive introspection (reference ParserShowTablesQuery.cpp,
    // InterpreterDescribeQuery.cpp, InterpreterShowCreateQuery.cpp,
    // InterpreterExistsQuery.cpp); types render in the reference's own
    // spelling via chTypeName
    // SELECT ... INTO OUTFILE 'path' [FORMAT fmt] (reference
    // ParserQueryWithOutput / WriteBufferFromFile sink): the distributed
    // analog writes a directory of parts via the DataFrame writers
    // (TabSeparated default, CSV[WithNames], JSONEachRow).
    val outfileRe =
      "(?is)^(.*?)\\bINTO\\s+OUTFILE\\s+'([^']+)'(?:\\s+FORMAT\\s+(\\w+))?\\s*;?\\s*$".r
    chQuery match {
      case outfileRe(inner, path, fmt) =>
        val df = sql(spark, dir, inner)
        Option(fmt).map(_.toLowerCase).getOrElse("tabseparated") match {
          case "csv" => df.write.mode("overwrite").csv(path)
          case "csvwithnames" =>
            df.write.mode("overwrite").option("header", "true").csv(path)
          case "jsoneachrow" => df.write.mode("overwrite").json(path)
          case _ => df.write.mode("overwrite").option("sep", "\t").csv(path)
        }
        return df
      case _ => ()
    }
    val showTablesRe = ("(?is)^\\s*SHOW\\s+TABLES(?:\\s+FROM\\s+\\w+)?" +
      "(?:\\s+(NOT\\s+)?I?LIKE\\s+'([^']*)')?(?:\\s+LIMIT\\s+(.+?))?\\s*;?\\s*$").r
    val showCreateRe =
      "(?is)^\\s*SHOW\\s+CREATE\\s+(TEMPORARY\\s+)?(?:TABLE\\s+)?(\\w+)\\s*;?\\s*$".r
    val describeRe = "(?is)^\\s*DESC(?:RIBE)?\\s+(?:TABLE\\s+)?(\\w+)\\s*;?\\s*$".r
    val existsRe = "(?is)^\\s*EXISTS\\s+(?:TABLE\\s+)?(`[^`]+`|\\w+)\\s*;?\\s*$".r
    def chTypeName(dt: org.apache.spark.sql.types.DataType): String = {
      import org.apache.spark.sql.types._
      dt match {
        case ByteType => "Int8"
        case ShortType => "Int16"
        case IntegerType => "Int32"
        case LongType => "Int64"
        case FloatType => "Float32"
        case DoubleType => "Float64"
        case StringType => "String"
        case BooleanType => "Bool"
        case DateType => "Date"
        case _: TimestampType | TimestampNTZType => "DateTime64(6)"
        case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
        case BinaryType => "String"
        case a: ArrayType => s"Array(${chTypeName(a.elementType)})"
        case m: MapType => s"Map(${chTypeName(m.keyType)}, ${chTypeName(m.valueType)})"
        case s: StructType =>
          s"Tuple(${s.fields.map(f => s"${f.name} ${chTypeName(f.dataType)}").mkString(", ")})"
        case other => other.simpleString
      }
    }
    // bare CREATE TABLE name (col Type ...) ENGINE ... — no AS SELECT
    // (reference ParserCreateQuery.cpp): an empty session view with the
    // declared schema; ENGINE/ORDER BY/PARTITION BY are storage hints,
    // DEFAULT/MATERIALIZED/ALIAS exprs are recorded for insert-time fills.
    val bareCreateHead =
      "(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s*\\(".r
    def parseBareCreate(q: String): Option[DataFrame] = {
      import org.apache.spark.sql.types._
      val m = bareCreateHead.findFirstMatchIn(q).getOrElse(return None)
      var i = m.end; var depth = 1; var inStr = false
      while (i < q.length && depth > 0) {
        val c = q.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        i += 1
      }
      if (depth != 0) return None
      val rest = q.substring(i)
      if ("(?is)^\\s*AS\\b".r.findFirstIn(rest).isDefined) return None
      val name = safeViewName(m.group(1).stripPrefix("default."))
      // ReplicatedMergeTree('path', 'replica'): tables sharing a path are
      // replicas of one storage — later creates alias the first
      for (rm <- "(?is)ENGINE\\s*=?\\s*ReplicatedMergeTree\\s*\\(\\s*'([^']*)'".r
             .findFirstMatchIn(rest)) {
        val path = rm.group(1)
        replicaPaths.get(path) match {
          case Some(canon) if canon != name && spark.catalog.tableExists(canon) =>
            distributedTables.put(name, (canon, 1))
            spark.table(canon).createOrReplaceTempView(name); engineBacking.remove(name)
            // the replica carries its OWN declared DDL (replica arg
            // differs) — record metadata so SHOW CREATE renders it and
            // replicated metadata ALTERs can reach every sibling
            replicaGroup.put(name, path); replicaGroup.put(canon, path)
            try {
              val cs = ChTypes.parseColumns(q.substring(m.end, i - 1))
              tableColMeta.put(name, cs.map(cd => (cd.name,
                if (cd.chType.nonEmpty) cd.chType else "String",
                cd.defaultKind.toUpperCase, cd.defaultExpr.getOrElse(""))))
              tableColExtras.put(name, cs.map(cd => cd.name ->
                (cd.comment.getOrElse(""), cd.codec.getOrElse(""),
                  cd.colTtl.getOrElse(""))).toMap)
              tableDdlTail.put(name, rest.trim.stripSuffix(";").trim)
            } catch { case _: Exception => () }
            return Some(spark.table(canon).limit(0))
          case _ => replicaPaths.put(path, name); replicaGroup.put(name, path)
        }
      }
      // ENGINE = Distributed(cluster, db, local_table[, key]): a read
      // proxy over the local table, repeated once per shard
      for (dm <- "(?is)ENGINE\\s*=?\\s*Distributed\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)".r
             .findFirstMatchIn(rest)) {
        val dargs = splitArgs(dm.group(1)).map(_.trim)
        if (dargs.length >= 3) {
          val cl = dargs(0).stripPrefix("'").stripSuffix("'")
          val und = safeViewName(dargs(2).stripPrefix("'").stripSuffix("'")
            .stripPrefix("default.").stripPrefix("currentDatabase()."))
          val sh = testClusterShards.getOrElse(cl, (1, 1))._1
          if (spark.catalog.tableExists(und)) {
            val base = spark.table(und)
            val proxied = (1 until sh).foldLeft(base)((d, _) => d.unionAll(base))
            distributedTables.put(name, (und, sh))
            proxied.createOrReplaceTempView(name); engineBacking.remove(name)
            return Some(proxied.limit(0)) // CREATE emits no rows
          } else
            // target doesn't exist yet: record the routing INTENT (for
            // cycle detection only — inserts/reads must NOT route to a
            // missing table); reads fall through to the declared schema
            distributedIntents.put(name, und)
        }
      }
      val cols =
        try ChTypes.parseColumns(q.substring(m.end, i - 1))
        catch { case _: IllegalArgumentException => return None }
      if (cols.isEmpty) return None
      val fields = cols.map { c =>
        val dt = c.dataType match {
          case NullType => // typeless `col DEFAULT expr`: infer from expr
            try spark.sql(s"SELECT ${rewrite(c.defaultExpr.get)} AS x")
              .schema.head.dataType
            catch { case _: Exception => StringType }
          case other => other
        }
        // ch_nullable marks columns declared Nullable(T): outer-join
        // default-filling (join_use_nulls=0) must NOT touch them
        val md = if (c.chNullable)
          new org.apache.spark.sql.types.MetadataBuilder()
            .putBoolean("ch_nullable", true).build()
        else org.apache.spark.sql.types.Metadata.empty
        // the Spark nullability bit IS CH's Nullable(T) bit: a bare
        // `x UInt8` column is non-Nullable, so empty-set aggregates and
        // join default-fills see it (00572: avg over an empty declared
        // table is nan, not NULL)
        StructField(c.name, dt, nullable = c.chNullable, metadata = md)
      }
      validateCreate(q.substring(m.end, i - 1), rest)
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), StructType(fields))
      // DEFAULT/MATERIALIZED/ALIAS exprs must resolve against the schema
      // at CREATE time (reference validates them then, e.g. 01024)
      for (c <- cols; e <- c.defaultExpr) {
        // a bare `*` inside a DEFAULT/ALIAS expression is the reference's
        // UNKNOWN_IDENTIFIER (03443 anchor shape) — Spark would silently
        // expand it over the columns instead
        if ("[(,]\\s*\\*\\s*[,)]".r.findFirstIn(e).isDefined)
          throw new IllegalArgumentException(
            s"UNKNOWN_IDENTIFIER: * is not a column in a DEFAULT expression")
        empty.select(org.apache.spark.sql.functions.expr(rewrite(e)))
      }
      // column-level TTL expressions must resolve to Date/DateTime
      // (reference TTLDescription::create rejects e.g. defaultProfiles())
      for (item <- splitArgs(q.substring(m.end, i - 1)).map(_.trim);
           tm <- "(?is)\\bTTL\\s+(.+)$".r.findFirstMatchIn(item)) {
        import org.apache.spark.sql.types._
        val dt = empty.select(
          org.apache.spark.sql.functions.expr(rewrite(tm.group(1))))
          .schema.head.dataType
        dt match {
          case DateType | _: TimestampType | TimestampNTZType => ()
          case other => throw new IllegalArgumentException(
            s"BAD_TTL_EXPRESSION: TTL must be Date/DateTime, got ${other.simpleString}")
        }
      }
      parseEngineMeta(rest) match {
        case Some(meta) => tableEngines.put(name, meta)
        case None => tableEngines.remove(name)
      }
      // the deprecated positional MergeTree form (MergeTree(date, key,
      // granularity)) — plain MergeTree with parenthesized args
      if ("(?is)\\bENGINE\\s*=\\s*MergeTree\\s*\\(\\s*[^)\\s]".r
          .findFirstIn(rest).isDefined)
        legacyFormatTables.add(name)
      else legacyFormatTables.remove(name)
      // ENGINE = Join(strictness, kind, k1[, k2…]): record the key
      // columns so joinGet() can route lookups (reference StorageJoin)
      // the '=' after ENGINE is optional in the reference's grammar
      "(?is)\\bENGINE\\s*=?\\s*Join\\s*\\(\\s*\\w+\\s*,\\s*(\\w+)\\s*,\\s*(.+?)\\)".r
        .findFirstMatchIn(rest).foreach { jm =>
          joinEngineKeys.put(name, (jm.group(1).toUpperCase,
            splitArgs(jm.group(2))
              .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)))
        }
      cols.map(_.name).filter(_.contains('.'))
        .foreach(nestedColNames.add)
      hiddenInsertCols.put(name, cols.filter(cd =>
        cd.defaultKind == "materialized" || cd.defaultKind == "alias")
        .map(_.name).toSet)
      tableColTz.put(name,
        cols.collect { case cd if cd.chTz.isDefined => cd.name -> cd.chTz.get }
          .toMap)
      // a typeless `col DEFAULT expr` column DESCRIBEs with the type CH
      // would infer for the expression (integer-literal ladder, Float64
      // for fractions, String for quoted, Date/DateTime for date fns)
      def inferChType(e: String): String = {
        val s = e.trim
        if (s.matches("-?\\d+")) {
          val v = try BigInt(s) catch { case _: Exception => BigInt(1) << 70 }
          if (v >= 0) {
            if (v < 256) "UInt8" else if (v < 65536) "UInt16"
            else if (v < (BigInt(1) << 32)) "UInt32" else "UInt64"
          } else {
            if (v >= -128) "Int8" else if (v >= -32768) "Int16"
            else if (v >= Int.MinValue) "Int32" else "Int64"
          }
        }
        else if (s.matches("-?\\d*\\.\\d+([eE][+-]?\\d+)?")) "Float64"
        else if (s.startsWith("'")) "String"
        else if (s.toLowerCase.startsWith("today()")) "Date"
        else if (s.toLowerCase.startsWith("todate(")) "Date"
        else if (s.toLowerCase.startsWith("now()")) "DateTime"
        // `col (+|-|*) smallIntLiteral`: CH integer arithmetic promotes
        // to the NEXT WIDER type (NumberTraits: result bytes =
        // 2 * max(operand bytes), capped at 8 — 00079: UInt32 col + 1
        // is UInt64)
        else if (s.matches("(\\w+)\\s*[+\\-*]\\s*\\d+")) {
          val ref = s.takeWhile(c => c.isLetterOrDigit || c == '_')
          val widen = Map(
            "UInt8" -> "UInt16", "UInt16" -> "UInt32",
            "UInt32" -> "UInt64", "UInt64" -> "UInt64",
            "Int8" -> "Int16", "Int16" -> "Int32",
            "Int32" -> "Int64", "Int64" -> "Int64")
          cols.find(_.name == ref).map(_.chType).filter(_.nonEmpty)
            .map(t => widen.getOrElse(t, t)).getOrElse("")
        }
        // rand() is UInt32; inside integer arithmetic it widens to UInt64
        else if (s.matches("(?i).*\\brand\\(\\).*[+\\-*].*|.*[+\\-*].*\\brand\\(\\).*"))
          "UInt64"
        else if (s.matches("(?i)rand\\(\\)")) "UInt32"
        else ""
      }
      tableColMeta.put(name, cols.map(cd => (cd.name,
        if (cd.chType.nonEmpty) cd.chType
        else {
          val inf = cd.defaultExpr.map(inferChType).getOrElse("")
          if (inf.nonEmpty) inf else "String"
        },
        cd.defaultKind.toUpperCase, cd.defaultExpr.getOrElse(""))))
      tableColExtras.put(name, cols.map(cd => cd.name ->
        (cd.comment.getOrElse(""), cd.codec.getOrElse(""),
          cd.colTtl.getOrElse(""))).toMap)
      // INDEX entries of the column list (parseColumns skips them):
      // `INDEX name expr TYPE t [GRANULARITY g]`
      tableIndexes.put(name, splitArgs(q.substring(m.end, i - 1))
        .map(_.trim).filter(_.toLowerCase.startsWith("index "))
        .flatMap { item =>
          val body = item.drop("index".length).trim
          val idxName = body.takeWhile(!_.isWhitespace)
          val defTxt = normalizeIndexDef(body.drop(idxName.length).trim)
          if (idxName.nonEmpty && defTxt.nonEmpty) Some((idxName, defTxt))
          else None
        }.toVector)
      tableProjections.put(name, splitArgs(q.substring(m.end, i - 1))
        .map(_.trim).filter(_.toLowerCase.startsWith("projection "))
        .flatMap { item =>
          val body = item.drop("projection".length).trim
          val pName = body.takeWhile(!_.isWhitespace)
          val inner = body.drop(pName.length).trim
          if (pName.nonEmpty && inner.startsWith("(") && inner.endsWith(")"))
            Some((pName, inner.substring(1, inner.length - 1).trim))
          else None
        }.toVector)
      tableDdlTail.put(name, rest.trim.stripSuffix(";").trim)
      // MergeTree-family tables get data-part bookkeeping (system.parts
      // and the _part/_block_number row virtuals — reference
      // MergeTreePartInfo naming)
      if ("(?is)\\bENGINE\\s*=?\\s*\\w*MergeTree\\b".r.findFirstIn(rest).isDefined) {
        val pby = ("(?is)\\bPARTITION\\s+BY\\s+(.*?)\\s*(?=\\b(?:PRIMARY\\s+KEY|" +
          "ORDER\\s+BY|SAMPLE\\s+BY|TTL|SETTINGS|COMMENT)\\b|;?\\s*$)").r
          .findFirstMatchIn(rest).map(_.group(1).trim).getOrElse("")
        val gran = "(?i)index_granularity\\s*=\\s*(\\d+)".r
          .findFirstMatchIn(rest).map(_.group(1).toLong).getOrElse(8192L)
        ChParts.register(name, pby, gran, unsignedColsOf(name))
        "(?i)ratio_of_defaults_for_sparse_serialization\\s*=\\s*'?([0-9.]+)'?".r
          .findFirstMatchIn(rest)
          .foreach(mm => tableSparseRatio.put(name, mm.group(1).toDouble))
        ("(?is)\\bTTL\\s+(.+?)\\s*(?=\\b(?:SETTINGS|ORDER\\s+BY|PARTITION\\s+BY|" +
          "PRIMARY\\s+KEY|SAMPLE\\s+BY|COMMENT)\\b|;?\\s*$)").r
          .findFirstMatchIn(rest)
          .foreach(m => ChParts.setTtl(name, m.group(1).trim))
        ("(?is)\\bORDER\\s+BY\\s+(\\((?:[^()]|\\([^()]*\\))*\\)|[\\w`.]+" +
          "(?:\\s*\\((?:[^()]|\\([^()]*\\))*\\))?)").r
          .findFirstMatchIn(rest).foreach { m =>
            val ks = splitArgs(m.group(1).stripPrefix("(").stripSuffix(")"))
              .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
            ChParts.setOrderKeys(name, ks)
          }
      }
      tableDefaults.put(name,
        cols.collect { case c if c.defaultExpr.isDefined => c.name -> c.defaultExpr.get })
      dynamicCols.put(name, splitArgs(q.substring(m.end, i - 1)).flatMap { it =>
        "(?is)^\\s*`?(\\w+)`?\\s+(Dynamic|JSON|Variant)\\b".r
          .findFirstMatchIn(it.trim).map(_.group(1))
      }.toSet)
      "(?is)\\bINDEX\\s+\\w+\\s+(\\w+)\\s+TYPE\\s+vector_similarity\\s*\\([^)]*?(\\d+)\\s*\\)".r
        .findFirstMatchIn(q.substring(m.end, i - 1))
        .foreach(vm => vectorIndexDims.put(name, (vm.group(1), vm.group(2).toInt)))
      "(?is)\\bTTL\\s+(.+?)(?:\\s+(?:SETTINGS|ORDER\\s+BY|PARTITION\\s+BY|PRIMARY\\s+KEY)\\b.*)?$"
        .r.findFirstMatchIn(rest).foreach(mm => tableTtls.put(name, mm.group(1).trim))
      empty.createOrReplaceTempView(name); engineBacking.remove(name)
      Some(empty)
    }
    // An INSERT column list naming the same column twice is
    // DUPLICATE_COLUMN at analysis (reference InterpreterInsertQuery;
    // 01032) — checked before any retry machinery can paper over the
    // ambiguity.
    def checkDupInsertCols(listed: Seq[String]): Seq[String] = {
      val dups = listed.groupBy(identity).collect { case (c, o) if o.length > 1 => c }
      if (dups.nonEmpty) throw new IllegalArgumentException(
        s"DUPLICATE_COLUMN: column ${dups.head} specified more than once " +
          "in the INSERT column list")
      listed
    }
    // Cast listed columns to the table's declared types and fill unlisted
    // ones from DEFAULT exprs (NULL when none), in declared order.
    def fitToSchema(existing: DataFrame, name: String, listed: Seq[String],
                    incoming: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions.{col => fcol, expr => fexpr, lit => flit}
      val defaults = tableDefaults.getOrElse(name, Seq.empty).toMap
      val tzs = tableColTz.getOrElse(name, Map.empty)
      val fields = existing.schema.fields
      // an unlisted column with no declared DEFAULT fills with the TYPE
      // default (0 / '' / epoch / []); only Nullable(T) columns take NULL
      // (reference ColumnsDescription / addDefaults)
      def typeDefault(f: org.apache.spark.sql.types.StructField)
          : org.apache.spark.sql.Column = {
        import org.apache.spark.sql.types._
        // an unlisted Nested sub-column with a LISTED sibling fills with
        // element-defaults sized like the sibling (reference NestedUtils)
        val sibling =
          if (f.name.contains('.')) {
            val p = f.name.takeWhile(_ != '.')
            listed.find(_.startsWith(p + "."))
          } else None
        if (f.metadata.contains("ch_nullable")) flit(null).cast(f.dataType)
        else if (sibling.isDefined && f.dataType.isInstanceOf[ArrayType]) {
          val zero = f.dataType.asInstanceOf[ArrayType].elementType match {
            case StringType => "''"
            case DateType => "DATE'1970-01-01'"
            case _: TimestampType | TimestampNTZType => "to_timestamp(0)"
            case et => s"CAST(0 AS ${et.sql})"
          }
          fexpr(s"transform(`${sibling.get}`, __x -> $zero)")
        }
        else f.dataType match {
          case StringType | BinaryType => flit("").cast(f.dataType)
          case DateType => fexpr("DATE'1970-01-01'")
          case _: TimestampType | TimestampNTZType =>
            tzs.get(f.name) match {
              // epoch shown as the declared zone's wall clock
              case Some(tz) =>
                fexpr(s"from_utc_timestamp(to_timestamp(0), '$tz')")
                  .cast(f.dataType)
              case None => fexpr("to_timestamp(0)").cast(f.dataType)
            }
          case _: ArrayType => fexpr("array()").cast(f.dataType)
          case _: MapType => fexpr("map()").cast(f.dataType)
          case BooleanType => flit(false)
          case _: NumericType => flit(0).cast(f.dataType)
          case _ => flit(null).cast(f.dataType)
        }
      }
      val chTypeOf = tableColMeta.getOrElse(name, Seq.empty)
        .map(c => c._1 -> c._2).toMap
      fields.foldLeft(incoming) { (d, f) =>
        if (listed.contains(f.name)) {
          val src = fcol(s"`${f.name}`")
          val srcT = incoming.schema.fields.find(_.name == f.name)
            .map(_.dataType)
          d.withColumn(f.name,
            if (srcT.contains(f.dataType)) src.cast(f.dataType)
            else chIntWrapCast(src, chTypeOf.getOrElse(f.name, ""),
              f.dataType))
        } else defaults.get(f.name) match {
          case Some(e) => d.withColumn(f.name, fexpr(rewrite(e)).cast(f.dataType))
          case None => d.withColumn(f.name, typeDefault(f))
        }
      }.select(fields.map(f => fcol(s"`${f.name}`")).toIndexedSeq: _*)
    }
    lazy val ddl: Option[DataFrame] = chQuery match {
      case showTablesRe(notTok, pat, limitExpr) =>
        import spark.implicits._
        val like = Option(pat).map(_.replace("%", ".*").replace("_", "."))
        val neg = notTok != null
        // the reference lists the per-test DATABASE's tables — exclude
        // the always-registered fixture views and runtime system views
        val names = spark.catalog.listTables().collect().map(_.name).sorted.toSeq
          .filterNot(n => graft.core.Tables.all.contains(n) ||
            n.startsWith("system_") || n.startsWith("__") ||
            n.endsWith("__final") || n == "perf_hits")
          .filter(n => like.forall(p => n.matches(s"(?i)$p") != neg))
        // LIMIT takes any constant expression (reference 01012: LIMIT 2*2)
        val limited = Option(limitExpr).map(_.trim).filter(_.nonEmpty) match {
          case Some(le) =>
            val n = spark.range(1)
              .select(org.apache.spark.sql.functions.expr(rewrite(le)).cast("int"))
              .collect()(0).getInt(0)
            names.take(n)
          case None => names
        }
        Some(limited.toDF("name"))
      case describeRe(name) if spark.catalog.tableExists(name) =>
        import spark.implicits._
        // CH DESCRIBE: 7 TSV fields — name, DECLARED type, default kind,
        // default expression, comment, codec, ttl (empties render as
        // trailing tabs). Bare-created tables keep their declared CH
        // type text; others fall back to the closest CH spelling.
        val extras0 = tableColExtras.getOrElse(name, Map.empty)
        def ex(n: String): (String, String, String) = extras0.get(n) match {
          case Some((cmt, codec, ttl)) =>
            (cmt, if (codec.nonEmpty) s"CODEC($codec)" else "", ttl)
          case None => ("", "", "")
        }
        tableColMeta.get(name) match {
          case Some(meta0) =>
            Some(meta0.map { case (n, ty, kind, e) =>
              val (cmt, cdc, ttl) = ex(n)
              (n, chTypeMultiline(ty, 0), kind, e, cmt, cdc, ttl)
            }.toDF("name", "type", "default_type", "default_expression",
              "comment", "codec_expression", "ttl_expression"))
          case None =>
            Some(spark.table(name).schema.fields.toSeq
              .map { f =>
                val (cmt, cdc, ttl) = ex(f.name)
                (f.name, chTypeMultiline(chTypeName(f.dataType), 0),
                  "", "", cmt, cdc, ttl)
              }
              .toDF("name", "type", "default_type", "default_expression",
                "comment", "codec_expression", "ttl_expression"))
        }
      case showCreateRe(tmpKw, name) if spark.catalog.tableExists(name) =>
        import spark.implicits._
        // canonical reconstruction (reference InterpreterShowCreateQuery
        // formatting): backticked names, DECLARED CH types, default
        // kind/expression, clause-per-line storage block
        val extras = tableColExtras.getOrElse(name, Map.empty)
        def extraTxt(n: String): String = extras.get(n) match {
          case Some((cmt, codec, ttl)) =>
            (if (cmt.nonEmpty) s" COMMENT '$cmt'" else "") +
              (if (codec.nonEmpty) s" CODEC($codec)" else "") +
              (if (ttl.nonEmpty) s" TTL ${canonicalizeIntervals(ttl)}" else "")
          case None => ""
        }
        val cols = tableColMeta.get(name) match {
          case Some(meta) => meta.map { case (n, ty, kind, e) =>
            val kindTxt =
              if (e.nonEmpty && Seq("DEFAULT", "MATERIALIZED", "ALIAS", "EPHEMERAL")
                .contains(kind)) s" $kind $e"
              else ""
            s"    `$n` ${chTypeMultiline(ChTypes.canonicalType(ty), 4)}" +
              s"$kindTxt${extraTxt(n)}"
          }
          case None => spark.table(name).schema.fields.toSeq
            .map(f =>
              s"    `${f.name}` ${chTypeMultiline(chTypeName(f.dataType), 4)}" +
                extraTxt(f.name))
        }
        val idxLines = tableIndexes.getOrElse(name, Vector.empty)
          .map { case (inm, idef) => s"    INDEX $inm $idef" } ++
          tableProjections.getOrElse(name, Vector.empty)
            .map { case (pnm, pbody) => renderProjection(pnm, pbody) }
        // a mangled view name (numeric-leading or db-qualified original)
        // renders as its ORIGINAL spelling, backticked where needed
        val orig = tableAliases.collectFirst {
          case (o, m) if m == name && m == "t_" + o.replaceAll("\\W", "_") => o
        }.getOrElse(name)
        val (dbPart, tblPart) = orig.lastIndexOf('.') match {
          case -1 => ("default", orig)
          case k => (orig.take(k), orig.drop(k + 1))
        }
        def bq(s: String) = if (s.matches("[A-Za-z_]\\w*")) s else s"`$s`"
        val tail = formatDdlTail(tableDdlTail.getOrElse(name, ""),
          autoSettings = tmpKw == null)
          .replace("{database}", dbPart)
        // TEMPORARY tables render without the database qualifier
        // (reference InterpreterShowCreateQuery on temporary storage)
        val header =
          if (tmpKw == null) s"CREATE TABLE $dbPart.${bq(tblPart)}"
          else s"CREATE TEMPORARY TABLE ${bq(tblPart)}"
        Some(Seq(s"$header\n(\n" +
          (cols ++ idxLines).mkString(",\n") + s"\n)\n$tail")
          .toDF("statement"))
      case q9 if "(?is)^\\s*CHECK\\s+TABLE\\s+\\w+.*$".r.pattern.matcher(q9).matches =>
        // CHECK TABLE (reference InterpreterCheckQuery): every part is
        // consistent by construction here. single_value_result=0 lists
        // one row per part (part_name, 1, ''); default returns 1.
        import spark.implicits._
        val nm = "(?is)^\\s*CHECK\\s+TABLE\\s+(\\w+)".r
          .findFirstMatchIn(q9).get.group(1)
        val perPart = "(?i)check_query_single_value_result\\s*=\\s*0".r
          .findFirstIn(q9).isDefined
        if (perPart && ChParts.isTracked(nm))
          Some(ChParts.activeParts(nm).map(p => (p, 1, ""))
            .toDF("part_path", "is_passed", "message"))
        else Some(Seq(1).toDF("result"))
      case existsRe(name0)
          if !chQuery.trim.toLowerCase.startsWith("exists table (") =>
        import spark.implicits._
        val name = unqName(name0)
        Some(Seq(if (spark.catalog.tableExists(name)) 1 else 0).toDF("result"))
      case _ => innerDdl(chQuery)
    }
    // extractor so the (side-effecting: temp-view registration,
    // default/TTL recording) parse runs exactly once per statement
    object BareCreate {
      def unapply(q: String): Option[DataFrame] = parseBareCreate(q)
    }
    def innerDdl(chQuery: String): Option[DataFrame] = chQuery match {
      case createDictRe(name, key, table) =>
        registeredDicts.put(name, (table, key))
        // an attribute declared HIERARCHICAL names the parent column
        "(?is)(\\w+)\\s+\\w+\\s+HIERARCHICAL".r.findFirstMatchIn(chQuery)
          .foreach(m => dictParents.put(name, m.group(1)))
        Some(spark.table(table).limit(0))
      case dropDictRe(ifExists, name0) =>
        val name = name0.substring(name0.lastIndexOf('.') + 1)
        if (!registeredDicts.contains(name) && ifExists == null)
          throw new IllegalArgumentException(
            s"UNKNOWN_DICTIONARY: there is no dictionary $name0")
        registeredDicts.remove(name)
        Some(spark.range(0).toDF("dropped"))
      case killMutationRe() => Some(spark.range(0).toDF("ok"))
      case rowPolicyRe() => Some(spark.range(0).toDF("ok"))
      case modifyTtlRe(name, ttl) if spark.catalog.tableExists(name) =>
        if (legacyFormatTables.contains(name))
          throw new IllegalArgumentException(
            "BAD_ARGUMENTS: TTL is not supported for tables created with " +
              "the deprecated MergeTree syntax")
        replicaSiblings(name).foreach { t =>
          tableTtls.put(t, ttl.trim)
          tableDdlTail.get(t).foreach(raw => tableDdlTail.put(t,
            stripTailTtl(raw) + " TTL " + ttl.trim))
        }
        Some(spark.range(0).toDF("ok"))
      case removeTtlRe(name) if spark.catalog.tableExists(name) =>
        replicaSiblings(name).foreach { t =>
          tableTtls.remove(t)
          tableDdlTail.get(t).foreach(raw =>
            tableDdlTail.put(t, stripTailTtl(raw)))
        }
        Some(spark.range(0).toDF("ok"))
      case createRe(kind, name, clauses, inner) =>
        val df0 = sql(spark, dir, inner)
        // an explicit column list before ENGINE renames (and casts) the
        // SELECT result — `CREATE TABLE t (_part UInt32) ... AS SELECT 1`
        // stores a PHYSICAL column `_part` (03033)
        val declaredCols: Seq[ChTypes.ColumnDef] =
          if (!kind.toUpperCase.startsWith("MATERIALIZED") &&
              clauses.trim.startsWith("(")) {
            val t = clauses.trim
            var d = 0; var i2 = 0; var end = -1
            while (i2 < t.length && end < 0) {
              val c = t.charAt(i2)
              if (c == '(') d += 1
              else if (c == ')') { d -= 1; if (d == 0) end = i2 }
              i2 += 1
            }
            if (end > 0)
              try ChTypes.parseColumns(t.substring(1, end))
              catch { case _: Exception => Seq.empty }
            else Seq.empty
          } else Seq.empty
        val df =
          if (declaredCols.nonEmpty &&
              declaredCols.length == df0.columns.length) {
            tableColMeta.put(name, declaredCols.map(cd => (cd.name,
              if (cd.chType.nonEmpty) cd.chType else "String",
              cd.defaultKind.toUpperCase, cd.defaultExpr.getOrElse(""))))
            df0.toDF(declaredCols.map(_.name): _*).select(
              declaredCols.map(cd =>
                org.apache.spark.sql.functions.col(s"`${cd.name}`")
                  .cast(cd.dataType).as(cd.name)): _*)
          } else df0
        val out = if (kind.toUpperCase.startsWith("MATERIALIZED")) {
          // materialized: compute & persist the RESULT, not the query,
          // and register for insert-block propagation (the reference's
          // StorageMaterializedView applies the SELECT to each inserted
          // block and appends it to the view's storage)
          for (src <- "(?is)\\bFROM\\s+([A-Za-z_]\\w*)".r
                 .findFirstMatchIn(inner).map(_.group(1))
               if spark.catalog.tableExists(src))
            matViews.put(src, (name, inner) :: matViews.getOrElse(src, Nil)
              .filterNot(_._1 == name))
          // without POPULATE the view starts EMPTY — only blocks inserted
          // AFTER the create flow in (reference StorageMaterializedView)
          val m0 = if ("(?i)\\bPOPULATE\\b".r.findFirstIn(clauses).isDefined) df
            else df.limit(0)
          val m = m0.persist()
          m.count()
          m
        } else df
        // TTL <expr> among the storage clauses (terminated by the next
        // storage keyword or the AS boundary the regex already cut)
        "(?is)\\bTTL\\s+(.+?)(?:\\s+(?:SETTINGS|ORDER\\s+BY|PARTITION\\s+BY|PRIMARY\\s+KEY)\\b.*)?$"
          .r.findFirstMatchIn(clauses)
          .foreach(m => tableTtls.put(name, m.group(1).trim))
        out.createOrReplaceTempView(name); engineBacking.remove(name)
        // a MergeTree CTAS gets part bookkeeping, its SELECT being the
        // first insert block
        if (!kind.toUpperCase.startsWith("MATERIALIZED") &&
            "(?is)\\bENGINE\\s*=?\\s*\\w*MergeTree\\b".r
              .findFirstIn(clauses).isDefined) {
          val pby = ("(?is)\\bPARTITION\\s+BY\\s+(.*?)\\s*(?=\\b(?:PRIMARY\\s+KEY|" +
            "ORDER\\s+BY|SAMPLE\\s+BY|TTL|SETTINGS|COMMENT)\\b|;?\\s*$)").r
            .findFirstMatchIn(clauses).map(_.group(1).trim).getOrElse("")
          val gran = "(?i)index_granularity\\s*=\\s*(\\d+)".r
            .findFirstMatchIn(clauses).map(_.group(1).toLong).getOrElse(8192L)
          ChParts.register(name, pby, gran, unsignedColsOf(name))
          recordPartsBlock(spark, name, out)
        }
        Some(out.limit(0))
      case q2 if systemRe.pattern.matcher(q2).matches =>
        // STOP/START MERGES gates part-merge bookkeeping (reference
        // InterpreterSystemQuery ActionLocks); other SYSTEM verbs tune
        // server state with no analog here — all return ok
        "(?is)^\\s*SYSTEM\\s+(STOP|START)\\s+MERGES(?:\\s+(?:ON\\s+VOLUME\\s+\\S+\\s+)?([\\w.]+))?\\s*;?\\s*$".r
          .findFirstMatchIn(q2).foreach { m =>
            val t = Option(m.group(2)).map(_.stripPrefix("default."))
            if (m.group(1).equalsIgnoreCase("STOP"))
              t.foreach(ChParts.stopMerges)
            else t.foreach(ChParts.startMerges)
          }
        "(?is)^\\s*SYSTEM\\s+(UNLOAD|LOAD)\\s+PRIMARY\\s+KEY(?:\\s+([\\w.]+))?\\s*;?\\s*$".r
          .findFirstMatchIn(q2).foreach { m =>
            val t = Option(m.group(2)).map(_.stripPrefix("default."))
            if (m.group(1).equalsIgnoreCase("UNLOAD"))
              ChParts.unloadPrimaryKey(t)
            else ChParts.loadPrimaryKey(t)
          }
        Some(spark.range(0).toDF("ok"))
      // database DDL: the session catalog is single-database (`default`)
      // — clickhouse-test's per-test CREATE/DROP DATABASE and USE are
      // no-ops here. Database ENGINES the reference validates still
      // throw (MySQL needs a live server, Replicated needs zk args).
      case q2 if "(?is)^\\s*(CREATE|DROP)\\s+DATABASE\\b.*".r
          .pattern.matcher(q2).matches =>
        for (em <- "(?is)\\bENGINE\\s*=?\\s*(\\w+)".r.findFirstMatchIn(q2)
             if !Set("atomic", "ordinary", "memory", "lazy")
               .contains(em.group(1).toLowerCase))
          throw new IllegalArgumentException(
            s"BAD_ARGUMENTS: database engine ${em.group(1)} is not available here")
        Some(spark.range(0).toDF("ok"))
      case q2 if "(?is)^\\s*USE\\s+\\w+\\s*;?\\s*$".r.pattern.matcher(q2).matches =>
        Some(spark.range(0).toDF("ok"))
      // DETACH TABLE stashes the table; ATTACH TABLE restores it
      // (reference InterpreterDropQuery/InterpreterCreateQuery ATTACH)
      case q2 if "(?is)^\\s*DETACH\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?\\w+(?:\\s+PERMANENTLY)?\\s*(?:SYNC)?\\s*;?\\s*$"
          .r.pattern.matcher(q2).matches =>
        val nm = "(?is)\\bTABLE\\s+(?:IF\\s+EXISTS\\s+)?(\\w+)".r
          .findFirstMatchIn(q2).get.group(1)
        if (spark.catalog.tableExists(nm)) {
          detachedTables.put(nm, spark.table(nm))
          spark.catalog.dropTempView(nm)
          if (graft.core.Tables.all.contains(nm))
            graft.core.Tables.invalidateRegistered(spark)
        }
        Some(spark.range(0).toDF("ok"))
      case q2 if "(?is)^\\s*ATTACH\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?\\w+\\s*;?\\s*$"
          .r.pattern.matcher(q2).matches =>
        val nm = "(?is)\\bTABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\w+)".r
          .findFirstMatchIn(q2).get.group(1)
        detachedTables.remove(nm) match {
          case Some(df) => df.createOrReplaceTempView(nm)
          case None => throw new IllegalArgumentException(
            s"UNKNOWN_TABLE: cannot attach $nm — never detached")
        }
        Some(spark.range(0).toDF("ok"))
      // standalone CREATE/DROP FUNCTION statements (tests issue them as
      // separate statements; the registry is session-global). Validation
      // mirrors UserDefinedSQLFunctionFactory: no recursion, no
      // shadowing built-ins, no double-create, no dropping built-ins.
      case q2 if "(?is)^\\s*CREATE\\s+FUNCTION\\b.*->".r.findFirstIn(q2).isDefined &&
          locally { // standalone only — `CREATE FUNCTION ...; SELECT ...`
            val mm0 = createFnPattern.matcher(q2) // keeps the macro-prefix path
            mm0.find() && q2.substring(mm0.end).trim.stripPrefix(";").trim.isEmpty
          } =>
        val mm = createFnPattern.matcher(q2)
        require(mm.find(), s"cannot parse CREATE FUNCTION: $q2")
        val nm = mm.group(1)
        if (("(?i)\\b" + java.util.regex.Pattern.quote(nm) + "\\s*\\(").r
            .findFirstIn(mm.group(4)).isDefined)
          throw new IllegalArgumentException(
            s"CANNOT_CREATE_RECURSIVE_FUNCTION: $nm")
        if (registeredFns.contains(nm) ||
            Set("cast", "sum", "count", "min", "max", "avg", "if")
              .contains(nm.toLowerCase) ||
            (try spark.catalog.functionExists(nm.toLowerCase)
             catch { case _: Exception => false }))
          throw new IllegalArgumentException(s"FUNCTION_ALREADY_EXISTS: $nm")
        createFunction(q2)
        Some(spark.range(0).toDF("ok"))
      case q2 if "(?is)^\\s*DROP\\s+FUNCTION\\s+(?:IF\\s+EXISTS\\s+)?[\\w.]+\\s*;?\\s*$"
          .r.pattern.matcher(q2).matches =>
        val nm = "(?is)\\bFUNCTION\\s+(?:IF\\s+EXISTS\\s+)?([\\w.]+)".r
          .findFirstMatchIn(q2).get.group(1)
        val ifExists = "(?is)\\bIF\\s+EXISTS\\b".r.findFirstIn(q2).isDefined
        if (!registeredFns.contains(nm) && !ifExists)
          throw new IllegalArgumentException(
            if (Set("cast", "sum", "count", "min", "max", "avg", "if")
                  .contains(nm.toLowerCase) ||
                (try spark.catalog.functionExists(nm.toLowerCase)
                 catch { case _: Exception => false }))
              s"CANNOT_DROP_FUNCTION: $nm"
            else s"UNKNOWN_FUNCTION: $nm")
        dropFunction(nm)
        Some(spark.range(0).toDF("ok"))
      case BareCreate(df) =>
        Some(df)
      case createEngineAsTableRe(name0, engineTxt, _, src0)
          if spark.catalog.tableExists(
            safeViewName(src0.stripPrefix("default."))) =>
        // normalize to the AS-form clone and re-dispatch
        innerDdl(s"CREATE TABLE $name0 AS $src0 $engineTxt")
      case createAsTableRe(name0, src0, engine, engineArgs, cloneTail)
          if spark.catalog.tableExists(
            safeViewName(src0.stripPrefix("default."))) =>
        val name = safeViewName(name0.stripPrefix("default."))
        val src = safeViewName(src0.stripPrefix("default."))
        if (engine != null && engine.equalsIgnoreCase("distributed")) {
          // AS-form Distributed: a read proxy over the local table, one
          // copy per shard (mirrors the bare-CREATE handler). A
          // Distributed over another Distributed is the reference's
          // TOO_LARGE_DISTRIBUTED_DEPTH — fall through so it errors.
          val dargs = Option(engineArgs).map(a => splitArgs(a).map(_.trim))
            .getOrElse(Seq.empty)
          val undT = dargs.lift(2).map(_.stripPrefix("'").stripSuffix("'")
            .stripPrefix("default.").stripPrefix("currentDatabase()."))
          val undDb = dargs.lift(1).map(_.stripPrefix("'").stripSuffix("'"))
            .filter(d => d.equalsIgnoreCase("system"))
          val und = undT.map(t =>
            safeViewName(undDb.map(d => s"$d.$t").getOrElse(t)))
            .getOrElse(src)
          // Distributed-over-Distributed chains are legal up to
          // max_distributed_depth (default 5) — deeper is the
          // reference's TOO_LARGE_DISTRIBUTED_DEPTH
          def depth(t: String, acc: Int): Int =
            if (acc > 8) acc
            else if (t == name)
              throw new IllegalArgumentException(
                "INFINITE_LOOP: Distributed table routes back to itself")
            else distributedTables.get(t).map(_._1)
              .orElse(distributedIntents.get(t)) match {
              case Some(u) => depth(u, acc + 1)
              case None => acc
            }
          if (depth(und, 1) > 5)
            throw new IllegalArgumentException(
              "TOO_LARGE_DISTRIBUTED_DEPTH: distributed chain exceeds max_distributed_depth")
          if (!spark.catalog.tableExists(und))
            None
          else {
            val cl = dargs.headOption.map(_.stripPrefix("'").stripSuffix("'"))
              .getOrElse("")
            val sh = testClusterShards.getOrElse(cl, (1, 1))._1
            val base = spark.table(und)
            val proxied = (1 until sh).foldLeft(base)((d, _) => d.unionAll(base))
            distributedTables.put(name, (und, sh))
            proxied.createOrReplaceTempView(name); engineBacking.remove(name)
            Some(proxied.limit(0))
          }
        } else if (engine != null && engine.equalsIgnoreCase("buffer") &&
            engineArgs != null) {
          // Buffer(db, table, ...): route the new name to the flush
          // target when it exists; else behave as a plain clone
          val dargs = splitArgs(engineArgs).map(_.trim)
          val tgt = dargs.lift(1)
            .map(t => safeViewName(t.stripPrefix("'").stripSuffix("'")
              .stripPrefix("default."))).filter(spark.catalog.tableExists)
          tgt match {
            case Some(t) =>
              tableAliases.put(name0, t)
              Some(spark.table(t).limit(0))
            case None =>
              spark.table(src).limit(0).createOrReplaceTempView(name); engineBacking.remove(name)
              Some(spark.table(name).limit(0))
          }
        } else {
          spark.table(src).limit(0).createOrReplaceTempView(name); engineBacking.remove(name)
          tableDefaults.get(src).foreach(tableDefaults.put(name, _))
          tableEngines.get(src).foreach(tableEngines.put(name, _))
          // the clone's DDL tail is its own ENGINE clause if given, else
          // the source's — never a stale tail from a prior same-named table
          if (engine != null) {
            val tailTxt = Option(cloneTail).map(_.trim).filter(_.nonEmpty)
              .map(" " + _).getOrElse("")
            tableDdlTail.put(name, "ENGINE = " + engine +
              Option(engineArgs).map(a => s"($a)").getOrElse("") + tailTxt)
            // a MergeTree-family clone gets data-part bookkeeping like a
            // bare CREATE (polymorphic_parts.xml clone-with-clauses)
            if (engine.toLowerCase.contains("mergetree")) {
              val pby = ("(?is)\\bPARTITION\\s+BY\\s+(.*?)\\s*(?=\\b(?:PRIMARY\\s+KEY|" +
                "ORDER\\s+BY|SAMPLE\\s+BY|TTL|SETTINGS|COMMENT)\\b|;?\\s*$)").r
                .findFirstMatchIn(tailTxt).map(_.group(1).trim).getOrElse("")
              val gran = "(?i)index_granularity\\s*=\\s*(\\d+)".r
                .findFirstMatchIn(tailTxt).map(_.group(1).toLong).getOrElse(8192L)
              ChParts.register(name, pby, gran,
                unsignedColsOf(name) ++ unsignedColsOf(src))
            }
          }
          else tableDdlTail.get(src) match {
            case Some(t) => tableDdlTail.put(name, t)
            case None => tableDdlTail.remove(name)
          }
          tableColMeta.get(src).foreach(tableColMeta.put(name, _))
          tableColExtras.get(src) match {
            case Some(x) => tableColExtras.put(name, x)
            case None => tableColExtras.remove(name)
          }
          tableIndexes.get(src) match {
            case Some(x) => tableIndexes.put(name, x)
            case None => tableIndexes.remove(name)
          }
          tableProjections.get(src) match {
            case Some(x) => tableProjections.put(name, x)
            case None => tableProjections.remove(name)
          }
          Some(spark.table(name).limit(0))
        }
      case q if createDbRe.pattern.matcher(q).matches ||
          dropDbRe.pattern.matcher(q).matches ||
          useRe.pattern.matcher(q).matches =>
        Some(spark.range(0).toDF("ok"))
      case dropRe(name1) =>
        val name = unqName(name1)
        spark.catalog.dropTempView(name)
        if (graft.core.Tables.all.contains(name))
          graft.core.Tables.invalidateRegistered(spark)
        tableTtls.remove(name); tableDefaults.remove(name)
        distributedTables.remove(name); tableEngines.remove(name)
        engineBacking.remove(name); engineBlockSeq.remove(name)
        joinEngineKeys.remove(name); legacyFormatTables.remove(name)
        matViews.remove(name)
        // text-level aliases (Buffer write-through, unparseable names)
        // must die with the table or they rewrite LATER sessions' texts
        for ((k, v) <- tableAliases if k == name || v == name)
          tableAliases.remove(k)
        hiddenInsertCols.remove(name); tableColMeta.remove(name)
        tableColTz.remove(name); alterVirtualCols.remove(name)
        tableDdlTail.remove(name)
        tableColExtras.remove(name); tableIndexes.remove(name)
        tableProjections.remove(name); replicaGroup.remove(name)
        tableSparseRatio.remove(name)
        ChParts.drop(name); virtualShadow.remove(name)
        detachedRows.remove(name)
        spark.catalog.dropTempView("__vt_" + name)
        hiddenInsertCols.remove("__vt_" + name)
        for ((src, mvs) <- matViews if mvs.exists(_._1 == name))
          matViews.put(src, mvs.filterNot(_._1 == name))
        for ((p, c) <- replicaPaths if c == name) replicaPaths.remove(p)
        Some(spark.range(0).toDF("dropped"))
      // INSERT ... FORMAT <fmt> with inline data (reference
      // ParserInsertQuery data tail). Values delegates to the VALUES
      // path; CSV/TSV/JSONEachRow parse the trailing lines.
      case insertFmtRe(name0, colsOpt, fmt, data0)
          if Seq("values", "csv", "csvwithnames", "tsv", "tabseparated",
                 "jsoneachrow").contains(fmt.toLowerCase) =>
        val data = data0.trim
        if (fmt.equalsIgnoreCase("Values"))
          return Some(sql(spark, dir,
            s"INSERT INTO $name0 ${Option(colsOpt).map(c => s"($c) ").getOrElse("")}VALUES $data"))
        val name = distributedTables.get(name0).map(_._1).getOrElse(name0)
        val existing = spark.table(name)
        val listed = Option(colsOpt).map(_.trim).filter(_.nonEmpty)
          .map(splitArgs(_).map(_.trim.stripPrefix("`").stripSuffix("`")))
          .map(checkDupInsertCols)
          .getOrElse(existing.columns.toSeq)
        val lines0 = data.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
        val lines =
          if (fmt.toLowerCase == "csvwithnames") lines0.drop(1) else lines0
        import org.apache.spark.sql.types._
        val incoming: DataFrame = fmt.toLowerCase match {
          case "jsoneachrow" =>
            import spark.implicits._
            spark.read.json(spark.createDataset(lines))
          case f =>
            val rows = lines.map { l =>
              val cells =
                if (f.startsWith("csv")) splitCsvLine(l)
                else l.split("\t", -1).toSeq.map(c =>
                  if (c == "\\N") null else unescapeTsv(c))
              org.apache.spark.sql.Row(cells.padTo(listed.length, null): _*)
            }
            val schema = StructType(listed.map(c => StructField(c, StringType)))
            val raw = spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](
                scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
            // container-typed targets need a text parse, not a cast
            listed.foldLeft(raw) { (d, c) =>
              existing.schema.find(_.name == c).map(_.dataType) match {
                case Some(mt: MapType) =>
                  d.withColumn(c, org.apache.spark.sql.functions.expr(
                    s"CAST(str_to_map(translate(trim(BOTH '{}' FROM `$c`), \"'\", ''), ',', ':') AS ${mt.sql})"))
                case Some(at: ArrayType) =>
                  d.withColumn(c, org.apache.spark.sql.functions.expr(
                    s"CAST(split(trim(BOTH '[]' FROM translate(`$c`, \"'\", '')), ',') AS ${at.sql})"))
                case _ => d
              }
            }
        }
        val block = fitToSchema(existing, name,
          listed.filter(incoming.columns.contains), incoming)
        checkVectorDims(name, block)
        val sorted = sortInsertBlock(block, name)
        val appended = existing.unionByName(sorted)
        appended.createOrReplaceTempView(name)
        appendEngineBlock(name, existing, sorted)
        recordPartsBlock(spark, name, sorted, block)
        refreshDistributed(spark, name)
        propagateMatViews(spark, dir, name, block)
        Some(appended.limit(0))
      case insertSelRe(name0, colsOpt, inner) =>
        // writes to a Distributed proxy land in its underlying table
        val name = distributedTables.get(name0).map(_._1).getOrElse(name0)
        val existing = spark.table(name)
        val src = sql(spark, dir, inner)
        val listed = Option(colsOpt).map(_.trim).filter(_.nonEmpty)
          .map(splitArgs(_).map(_.trim.stripPrefix("`").stripSuffix("`")))
          .map(checkDupInsertCols)
          .getOrElse(existing.columns.take(src.columns.length).toSeq)
        val block = fitToSchema(existing, name, listed, src.toDF(listed: _*))
        checkVectorDims(name, block)
        val sorted = sortInsertBlock(block, name)
        val appended = existing.unionByName(sorted)
        appended.createOrReplaceTempView(name)
        appendEngineBlock(name, existing, sorted)
        recordPartsBlock(spark, name, sorted, block)
        refreshDistributed(spark, name)
        propagateMatViews(spark, dir, name, block)
        Some(appended.limit(0))
      case insertValRe(name0, colsOpt, values0) =>
        // CH accepts rows without separating commas: VALUES (1) (2) (3)
        val values = locally {
          val sb = new StringBuilder; var d = 0; var inS = false; var i = 0
          while (i < values0.length) {
            val c = values0.charAt(i)
            sb.append(c)
            if (inS) { if (c == '\'') inS = false }
            else c match {
              case '\'' => inS = true
              case '(' => d += 1
              case ')' =>
                d -= 1
                if (d == 0) {
                  var j = i + 1
                  while (j < values0.length && values0.charAt(j).isWhitespace) j += 1
                  if (j < values0.length && values0.charAt(j) == '(') sb.append(',')
                }
              case _ =>
            }
            i += 1
          }
          sb.toString
        }
        val name = distributedTables.get(name0).map(_._1).getOrElse(name0)
        val existing = spark.table(name)
        val listed = Option(colsOpt).map(_.trim).filter(_.nonEmpty)
          .map(splitArgs(_).map(_.trim.stripPrefix("`").stripSuffix("`")))
          .map(checkDupInsertCols)
          .getOrElse {
            // positional INSERT targets the INSERTABLE columns only —
            // MATERIALIZED/ALIAS columns always compute from their exprs
            val hidden = hiddenInsertCols.getOrElse(name, Set.empty)
            existing.columns.toSeq.filterNot(hidden)
          }
        val colAliases = listed.map(c => s"`$c`").mkString(", ")
        val vdf =
          try spark.sql(s"SELECT * FROM (VALUES ${rewrite(values)}) " +
            s"AS __v($colAliases)")
          catch {
            // Spark inline tables cannot evaluate HOF/lambda expressions
            // (e.g. bitmapBuild -> array_sort(comparator)): route such
            // rows through a UNION ALL of SELECTs instead
            case e: Exception
                if Option(e.getMessage).exists(_.contains("INVALID_INLINE_TABLE")) =>
              val rows = splitArgs(values).map(_.trim)
                .map(r => r.stripPrefix("(").stripSuffix(")"))
              val sel = rows.map(r => s"SELECT ${rewrite(r)}")
                .mkString(" UNION ALL ")
              spark.sql(s"SELECT * FROM ($sel) AS __v($colAliases)")
          }
        val block = fitToSchema(existing, name, listed, vdf)
        checkVectorDims(name, block)
        val sorted = sortInsertBlock(block, name)
        val appended = existing.unionByName(sorted)
        appended.createOrReplaceTempView(name)
        appendEngineBlock(name, existing, sorted)
        recordPartsBlock(spark, name, sorted, block)
        refreshDistributed(spark, name)
        propagateMatViews(spark, dir, name, block)
        Some(appended.limit(0))
      case alterMultiRe(name, actions) =>
        // split on top-level commas that START a new COLUMN action
        val parts = splitArgs(actions).map(_.trim).filter(_.nonEmpty)
        val merged = parts.foldLeft(Vector.empty[String]) { (acc, p) =>
          if (acc.isEmpty ||
              "(?is)^(ADD|DROP|MODIFY|RENAME|CLEAR|COMMENT)\\s+COLUMN\\b".r
                .findFirstIn(p).isDefined) acc :+ p
          else acc.init :+ (acc.last + ", " + p) // comma inside one action
        }
        if (merged.length <= 1) None.orElse {
          // not actually multi-action: fall through to single handlers
          innerDdl2(chQuery)
        } else {
          merged.foreach(a => sql(spark, dir, s"ALTER TABLE $name $a"))
          Some(spark.range(0).toDF("ok"))
        }
      case other => innerDdl2(other)
    }
    def innerDdl2(chQuery: String): Option[DataFrame] = chQuery match {
      case alterAddColRe(name, colName0, declaredType, matKind, dflt, after0)
          if declaredType.trim.toLowerCase.startsWith("nested") =>
        // ADD COLUMN n Nested(a T1, b T2): expand into the flattened
        // array sub-columns, same as CREATE (reference NestedUtils).
        // IF NOT EXISTS skips the WHOLE group when any sub-column exists.
        val inner = declaredType.trim.drop("nested".length).trim
          .stripPrefix("(").stripSuffix(")")
        val name1 = colName0.stripPrefix("`").stripSuffix("`")
        if (spark.table(name).columns.exists(_.startsWith(name1 + ".")))
          return Some(spark.range(0).toDF("ok"))
        // chain the AFTER anchor so the sub-columns land in declared order
        ChTypes.parseColumns(inner).foldLeft(Option(after0)) { (prev, sub) =>
          sql(spark, dir, s"ALTER TABLE $name ADD COLUMN " +
            s"`$name1.${sub.name}` Array(${sub.chType})" +
            prev.map(a => s" AFTER `${a.stripPrefix("`").stripSuffix("`")}`")
              .getOrElse(""))
          Some(s"$name1.${sub.name}")
        }
        Some(spark.range(0).toDF("ok"))
      case alterAddColRe(name, colName0, declaredType, matKind, dflt, after0) =>
        val colName = colName0.stripPrefix("`").stripSuffix("`")
        if (spark.table(name).columns.contains(colName))
          return Some(spark.range(0).toDF("ok")) // IF NOT EXISTS no-op
        if (colName.contains('.')) nestedColNames.add(colName)
        // a new sub-column of an EXISTING Nested group defaults to an
        // array of element-defaults sized like its siblings (reference
        // NestedUtils consistency fill, 00147)
        val sibling =
          if (colName.contains('.')) {
            val p = colName.takeWhile(_ != '.')
            spark.table(name).columns.find(_.startsWith(p + "."))
          } else None
        // a declared type with quoted parameters must PARSE — unknown
        // quoted types (Object('json'), 02910) are the reference's
        // SUPPORT_IS_DISABLED / ILLEGAL_COLUMN class
        if (declaredType.contains("'"))
          try ChTypes.toSpark(declaredType.trim)
          catch { case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"ILLEGAL_COLUMN: cannot add column of type $declaredType")
          }
        val t0 = spark.table(name)
        // the new column fills with its DEFAULT, else the TYPE default
        val fillExpr =
          if (dflt != null) org.apache.spark.sql.functions.expr(rewrite(dflt))
          else if (sibling.isDefined) {
            import org.apache.spark.sql.types._
            val et = try ChTypes.toSpark(declaredType.trim) match {
              case ArrayType(e0, _) => e0
              case other => other
            } catch { case _: IllegalArgumentException => LongType }
            val zero = et match {
              case StringType => "''"
              case DateType => "DATE'1970-01-01'"
              case _: TimestampType | TimestampNTZType => "to_timestamp(0)"
              case _ => s"CAST(0 AS ${et.sql})"
            }
            org.apache.spark.sql.functions.expr(
              s"transform(`${sibling.get}`, __x -> $zero)")
          }
          else try {
            import org.apache.spark.sql.types._
            val dt = ChTypes.toSpark(declaredType.trim)
            if (declaredType.trim.toLowerCase.startsWith("nullable"))
              org.apache.spark.sql.functions.lit(null).cast(dt)
            else dt match {
              case StringType | BinaryType =>
                org.apache.spark.sql.functions.lit("").cast(dt)
              case DateType =>
                org.apache.spark.sql.functions.expr("DATE'1970-01-01'")
              case _: TimestampType | TimestampNTZType =>
                org.apache.spark.sql.functions.expr("to_timestamp(0)")
              case _: ArrayType =>
                org.apache.spark.sql.functions.expr("array()").cast(dt)
              case _: MapType =>
                org.apache.spark.sql.functions.expr("map()").cast(dt)
              case _: NumericType =>
                org.apache.spark.sql.functions.lit(0).cast(dt)
              case _ => org.apache.spark.sql.functions.lit(null).cast(dt)
            }
          } catch { case e: IllegalArgumentException =>
            // quoted type parameters that still fail to parse are the
            // reference's UNKNOWN_TYPE / ILLEGAL_COLUMN errors (02910
            // Tuple(Object('json'))); bare unknown words keep the old
            // permissive typeless-column behavior
            if (declaredType.contains("'"))
              throw new IllegalArgumentException(
                s"ILLEGAL_COLUMN: cannot add column of type $declaredType")
            org.apache.spark.sql.functions.expr("CAST(NULL AS STRING)")
          }
        var withCol = t0.withColumn(colName, fillExpr)
        // AFTER x: reorder so SELECT * shows the declared position
        val after = Option(after0).map(_.stripPrefix("`").stripSuffix("`"))
        for (a <- after if t0.columns.contains(a)) {
          val before = withCol.columns.filterNot(_ == colName)
          val idx = before.indexOf(a)
          val order = (before.take(idx + 1) :+ colName) ++ before.drop(idx + 1)
          withCol = withCol.select(order.map(x =>
            org.apache.spark.sql.functions.col(s"`$x`")).toIndexedSeq: _*)
        }
        withCol.createOrReplaceTempView(name); engineBacking.remove(name)
        if (dflt == null)
          alterVirtualCols.put(name,
            alterVirtualCols.getOrElse(name, Set.empty) + colName)
        if (matKind != null) // MATERIALIZED: hidden from * and INSERT
          hiddenInsertCols.put(name,
            hiddenInsertCols.getOrElse(name, Set.empty) + colName)
        if (dflt != null) // later INSERTs compute the declared expression
          tableDefaults.put(name, tableDefaults.getOrElse(name, Seq.empty)
            .filterNot(_._1 == colName) :+ (colName -> dflt))
        tableColMeta.get(name).foreach { meta0 =>
          val entry = (colName, declaredType.trim,
            if (dflt != null && matKind != null) "MATERIALIZED"
            else if (dflt != null) "DEFAULT" else "",
            Option(dflt).getOrElse(""))
          val idx = after.map(a => meta0.indexWhere(_._1 == a))
            .filter(_ >= 0).map(_ + 1).getOrElse(meta0.length)
          tableColMeta.put(name,
            (meta0.take(idx) :+ entry) ++ meta0.drop(idx))
        }
        Some(withCol.limit(0))
      case alterModDefRe(name, colName0, kind, e) =>
        val colName = colName0.stripPrefix("`").stripSuffix("`")
        // the default expression must be convertible to the column's
        // type (reference AlterCommands::validate, 01522): a string
        // default on a numeric column is an error, not a NULL cast
        val t522 = spark.table(name)
        if (t522.columns.contains(colName)) {
          import org.apache.spark.sql.types._
          val eType = t522.limit(0)
            .select(org.apache.spark.sql.functions.expr(rewrite(e)))
            .schema.head.dataType
          val cType = t522.schema(colName).dataType
          if (eType == StringType && cType.isInstanceOf[NumericType])
            throw new IllegalArgumentException(
              s"CANNOT_PARSE_TEXT: default for $colName does not match its type")
        }
        tableDefaults.put(name, tableDefaults.getOrElse(name, Seq.empty)
          .filterNot(_._1 == colName) :+ (colName -> e))
        if (kind.equalsIgnoreCase("materialized") || kind.equalsIgnoreCase("alias"))
          hiddenInsertCols.put(name,
            hiddenInsertCols.getOrElse(name, Set.empty) + colName)
        else hiddenInsertCols.put(name,
          hiddenInsertCols.getOrElse(name, Set.empty) - colName)
        tableColMeta.get(name).foreach { meta0 =>
          tableColMeta.put(name, meta0.map(m =>
            if (m._1 == colName) (m._1, m._2, kind.toUpperCase, e) else m))
        }
        Some(spark.range(0).toDF("ok"))
      case alterDropColRe(name, colName0) =>
        val colName = colName0.stripPrefix("`").stripSuffix("`")
        val dropped = spark.table(name).drop(colName)
        dropped.createOrReplaceTempView(name); engineBacking.remove(name)
        tableColMeta.get(name).foreach(m =>
          tableColMeta.put(name, m.filterNot(_._1 == colName)))
        Some(dropped.limit(0))
      case alterRenColRe(name, from, to) =>
        val renamed = spark.table(name).withColumnRenamed(from, to)
        renamed.createOrReplaceTempView(name); engineBacking.remove(name)
        Some(renamed.limit(0))
      case alterRemovePropRe(name, col0, what) if spark.catalog.tableExists(name) =>
        val col = col0.stripPrefix("`").stripSuffix("`")
        replicaSiblings(name).foreach { t =>
          what.toUpperCase match {
            case "DEFAULT" | "MATERIALIZED" | "ALIAS" =>
              tableColMeta.get(t).foreach(ms => tableColMeta.put(t,
                ms.map(mm => if (mm._1 == col) (mm._1, mm._2, "", "") else mm)))
              tableDefaults.get(t).foreach(ds =>
                tableDefaults.put(t, ds.filterNot(_._1 == col)))
              hiddenInsertCols.get(t).foreach(hs =>
                hiddenInsertCols.put(t, hs - col))
            case other =>
              val cur = tableColExtras.getOrElse(t, Map.empty)
              cur.get(col).foreach { case (c1, c2, c3) =>
                val upd = other match {
                  case "COMMENT" => ("", c2, c3)
                  case "CODEC" => (c1, "", c3)
                  case _ => (c1, c2, "")
                }
                tableColExtras.put(t, cur + (col -> upd))
              }
          }
        }
        Some(spark.table(name).limit(0))
      case alterModColRe(name, ifExists, colName, _, _)
          if !spark.table(name).columns.contains(colName) =>
        // MODIFY COLUMN IF EXISTS on a missing column is a no-op; without
        // IF EXISTS the reference rejects it (AlterCommands::validate,
        // NOT_FOUND_COLUMN_IN_BLOCK)
        if (ifExists == null)
          throw new IllegalArgumentException(
            s"NOT_FOUND_COLUMN_IN_BLOCK: there is no column $colName in table $name")
        Some(spark.range(0).toDF("ok"))
      case alterModColRe(name, _, colName, chType, _)
          if chType.trim.toLowerCase.startsWith("object") =>
        // the reference rejects converting stored columns to the
        // experimental Object type (02725: "not allowed")
        throw new IllegalArgumentException(
          s"CANNOT_PARSE_TEXT: changing column $colName to ${chType.trim} is not allowed")
      case alterModColRe(name, _, colName, chType, modDflt) =>
        val sqlT = chType.trim match {
          case "Int8" => "TINYINT"
          case "Int16" => "SMALLINT"
          case "Int32" => "INT"
          case "Int64" | "UInt32" | "UInt16" | "UInt8" => "BIGINT"
          case "UInt64" => "DECIMAL(20,0)"
          case "Float32" => "FLOAT"
          case "Float64" => "DOUBLE"
          case "Date" | "Date32" => "DATE"
          case "DateTime" => "TIMESTAMP"
          case d if d.startsWith("Decimal(") => d.replace("Decimal", "DECIMAL")
          case _ => "STRING"
        }
        val isVirtual = alterVirtualCols.getOrElse(name, Set.empty)
          .contains(colName)
        val modified =
          if (isVirtual) // no stored data: substitute the NEW type default
            spark.table(name).withColumn(colName,
              org.apache.spark.sql.functions.expr(sqlT match {
                case "STRING" => "''"
                case "DATE" => "DATE'1970-01-01'"
                case "TIMESTAMP" => "to_timestamp(0)"
                case _ => s"CAST(0 AS $sqlT)"
              }))
          else spark.table(name).withColumn(colName,
            org.apache.spark.sql.functions.col(colName).cast(sqlT))
        modified.createOrReplaceTempView(name); engineBacking.remove(name)
        tableColMeta.get(name).foreach(m => tableColMeta.put(name,
          m.map(x => if (x._1 == colName)
              (x._1, chType.trim,
                if (modDflt != null) "DEFAULT" else x._3,
                if (modDflt != null) modDflt.trim.stripSuffix(";") else x._4)
            else x)))
        // later INSERTs that omit the column must compute the NEW default
        // (mirrors the ADD COLUMN path, which updates both registries)
        if (modDflt != null) {
          val d = modDflt.trim.stripSuffix(";")
          tableDefaults.put(name,
            tableDefaults.getOrElse(name, Seq.empty)
              .filterNot(_._1 == colName) :+ (colName -> d))
        }
        // a type change REWRITES the column data — it is a mutation and
        // stamps parts with a fresh version suffix (01414)
        if (!isVirtual && ChParts.isTracked(name))
          renameShadowParts(name, ChParts.mutate(name))
        Some(modified.limit(0))
      // partition commands (reference PartitionCommands): DROP forgets,
      // DETACH stashes, ATTACH re-adds as a fresh level-0 part with a
      // new block number, MOVE ... TO TABLE transfers rows. Row-level
      // effects run through the virtual-column shadow, which knows each
      // row's part.
      case q2 if ("(?is)^\\s*ALTER\\s+TABLE\\s+\\w+\\s+" +
          "(?:DROP|DETACH|ATTACH|MOVE)\\s+(?:PARTITION|PART)\\b.*$").r
          .pattern.matcher(q2).matches =>
        // a partition expression must be a constant — generators are
        // BAD_ARGUMENTS (02009: ATTACH PARTITION tuple(arrayJoin(...)))
        if ("(?i)\\barrayJoin\\s*\\(".r.findFirstIn(q2).isDefined)
          throw new IllegalArgumentException(
            "BAD_ARGUMENTS: partition expression must be a constant, " +
              "arrayJoin is not allowed")
        val m = ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+" +
          "(DROP|DETACH|ATTACH|MOVE)\\s+(PARTITION|PART)\\s+(?:ID\\s+)?" +
          "(.+?);?\\s*$").r.findFirstMatchIn(q2).get
        val name = m.group(1)
        val verb = m.group(2).toUpperCase
        val kind = m.group(3).toUpperCase
        val (spec0, destOpt) =
          "(?is)^(.*?)\\s+TO\\s+TABLE\\s+([\\w.]+)\\s*$".r
            .findFirstMatchIn(m.group(4).trim) match {
            case Some(mm) =>
              (mm.group(1).trim, Some(mm.group(2).stripPrefix("default.")))
            case None => (m.group(4).trim, None)
          }
        val spec = spec0.stripPrefix("'").stripSuffix("'")
        import org.apache.spark.sql.functions.{col, lit}
        def partPred(p: ChParts.Part): Boolean =
          if (kind == "PART") p.name == spec
          else if (spec.equalsIgnoreCase("tuple()"))
            p.partitionId == "all"
          else p.partitionId == spec || p.partition == spec
        def rowCond(sh: DataFrame) =
          if (kind == "PART") col("_part") === lit(spec)
          else if (spec.equalsIgnoreCase("tuple()"))
            col("_partition_id") === lit("all")
          else col("_partition_id") === lit(spec) ||
            col("_partition_value") === lit(spec)
        verb match {
          case "MOVE" if destOpt.contains(name) =>
            Some(spark.range(0).toDF("ok")) // move-to-self: no-op (03038)
          case "DROP" | "DETACH" | "MOVE" =>
            val removed = ChParts.removeParts(name, partPred, verb == "DETACH")
            virtualShadow.get(name) match {
              case Some(sh) if removed.nonEmpty || verb != "ATTACH" =>
                val cond = rowCond(sh)
                val moved = sh.filter(cond)
                val keptSh = sh.filter(!cond)
                if (verb == "DETACH")
                  detachedRows.put(name,
                    detachedRows.get(name).map(_.unionByName(moved))
                      .getOrElse(moved))
                virtualShadow.put(name, keptSh)
                val kept = keptSh.select(spark.table(name).columns
                  .map(c => col(s"`$c`")): _*)
                kept.createOrReplaceTempView(name); engineBacking.remove(name)
                for (dest <- destOpt if dest != name) {
                  val destCols = spark.table(dest).columns
                  val block = moved.select(destCols.map(c => col(s"`$c`")): _*)
                  val appended = spark.table(dest).unionByName(block)
                  appended.createOrReplaceTempView(dest)
                  engineBacking.remove(dest)
                  recordPartsBlock(spark, dest, block)
                }
              case None if ChParts.isTracked(name) && removed.nonEmpty =>
                // the shadow can be missing (tagBlock fallback dropped
                // it): delete rows via the partition predicate on the
                // main table instead of updating only system.parts
                if (kind == "PART")
                  throw new IllegalArgumentException(
                    "NOT_IMPLEMENTED: cannot resolve PART '" + spec +
                      "' to rows without part-level tracking")
                val pe = ChParts.partExprOf(name).getOrElse("")
                val condStr =
                  if (spec.equalsIgnoreCase("tuple()") || pe.isEmpty) "true"
                  else {
                    val vals = removed.map(_.partition.replace("'", "''"))
                      .distinct
                    s"CAST((${rewrite(pe)}) AS STRING) IN (" +
                      vals.map(v => s"'$v'").mkString(", ") + ")"
                  }
                val t = spark.table(name)
                val moved = t.filter(condStr)
                val kept = t.filter(s"NOT ($condStr)")
                if (verb == "DETACH")
                  detachedRows.put(name,
                    detachedRows.get(name).map(_.unionByName(moved))
                      .getOrElse(moved))
                kept.createOrReplaceTempView(name)
                engineBacking.remove(name)
                for (dest <- destOpt if dest != name) {
                  val destCols = spark.table(dest).columns
                  val block = moved.select(destCols.map(c => col(s"`$c`")): _*)
                  spark.table(dest).unionByName(block)
                    .createOrReplaceTempView(dest)
                  engineBacking.remove(dest)
                  recordPartsBlock(spark, dest, block)
                }
              case _ => ()
            }
            Some(spark.range(0).toDF("ok"))
          case "ATTACH" =>
            val back = ChParts.takeDetached(name, partPred)
            virtualShadow.get(name) match {
              case Some(_) if back.nonEmpty =>
                detachedRows.get(name).foreach { dr =>
                  val names = back.map(_.name).toSet
                  val take = dr.filter(col("_part").isin(names.toSeq: _*))
                  val rest = dr.filter(!col("_part").isin(names.toSeq: _*))
                  detachedRows.put(name, rest)
                  for (p <- back) {
                    val np = ChParts.attachAsNew(name, p.partition,
                      p.partitionId, p.rows)
                    val rows = take.filter(col("_part") === lit(p.name))
                      .withColumn("_part", lit(np.name))
                      .withColumn("_block_number", lit(np.minBlock))
                    virtualShadow.put(name,
                      virtualShadow(name).unionByName(rows))
                  }
                  val sh = virtualShadow(name)
                  val full = sh.select(spark.table(name).columns
                    .map(c => col(s"`$c`")): _*)
                  full.createOrReplaceTempView(name)
                  engineBacking.remove(name)
                }
              case _ => ()
            }
            Some(spark.range(0).toDF("ok"))
        }
      case alterHintRe(name) if spark.catalog.tableExists(name) =>
        // ADD/DROP INDEX maintain the declared-index list (metadata only
        // — skip indexes are storage hints; SHOW CREATE renders them)
        val addIdxRe = ("(?is)^ADD\\s+INDEX\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
          "(\\w+)\\s+(.*?)\\s*(?:\\b(FIRST|AFTER\\s+(\\w+))\\s*)?;?\\s*$").r
        val dropIdxRe =
          "(?is)^DROP\\s+INDEX\\s+(?:IF\\s+EXISTS\\s+)?(\\w+)\\s*;?\\s*$".r
        val addProjRe = ("(?is)^ADD\\s+PROJECTION\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
          "(\\w+)\\s+\\((.*)\\)\\s*;?\\s*$").r
        val dropProjRe =
          "(?is)^DROP\\s+PROJECTION\\s+(?:IF\\s+EXISTS\\s+)?(\\w+)\\s*;?\\s*$".r
        val body = "(?is)^\\s*ALTER\\s+TABLE\\s+\\w+\\s+(.*)$".r
          .findFirstMatchIn(chQuery).map(_.group(1)).getOrElse("")
        splitArgs(body).map(_.trim).foreach {
          case addIdxRe(idxName, rawDef, pos, after) =>
            val idef = normalizeIndexDef(rawDef.trim)
            val cur = tableIndexes.getOrElse(name, Vector.empty)
              .filterNot(_._1 == idxName)
            val updated = (Option(pos).map(_.trim.toUpperCase), Option(after)) match {
              case (Some("FIRST"), _) => (idxName, idef) +: cur
              case (Some(_), Some(aft)) =>
                val at = cur.indexWhere(_._1 == aft)
                if (at < 0) cur :+ ((idxName, idef))
                else {
                  val (pre, post) = cur.splitAt(at + 1)
                  pre ++ Vector((idxName, idef)) ++ post
                }
              case _ => cur :+ ((idxName, idef))
            }
            tableIndexes.put(name, updated)
          case dropIdxRe(idxName) =>
            tableIndexes.put(name, tableIndexes.getOrElse(name, Vector.empty)
              .filterNot(_._1 == idxName))
          case addProjRe(pName, pBody) =>
            tableProjections.put(name,
              tableProjections.getOrElse(name, Vector.empty)
                .filterNot(_._1 == pName) :+ ((pName, pBody.trim)))
          case dropProjRe(pName) =>
            tableProjections.put(name,
              tableProjections.getOrElse(name, Vector.empty)
                .filterNot(_._1 == pName))
          case _ => ()
        }
        Some(spark.range(0).toDF("ok"))
      // FREEZE marks active parts frozen (reference PartitionCommands
      // FREEZE -> shadow/ hardlinks; observable via system.parts.is_frozen)
      case q2 if "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+(?:FREEZE|UNFREEZE)\\b.*$".r
          .pattern.matcher(q2).matches =>
        val m = "(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+)\\s+(FREEZE|UNFREEZE)\\b.*$".r
          .findFirstMatchIn(q2).get
        val pf = "(?is)\\bPARTITION\\s+(?:ID\\s+)?('([^']*)'|\\w+)".r
          .findFirstMatchIn(q2)
          .map(x => Option(x.group(2)).getOrElse(x.group(1)))
        if (m.group(2).equalsIgnoreCase("FREEZE"))
          ChParts.freeze(m.group(1), pf)
        Some(spark.range(0).toDF("ok"))
      case alterSettingRe(name) if spark.catalog.tableExists(name) =>
        // the reference rejects per-table setting changes on OLD-FORMAT
        // MergeTree tables (deprecated positional-args syntax) and
        // unknown setting names (MergeTreeSettings; 01089 / 02252)
        if (legacyFormatTables.contains(name))
          throw new IllegalArgumentException(
            "NOT_IMPLEMENTED: ALTER MODIFY SETTING is not supported for tables " +
              "created with the deprecated MergeTree syntax")
        val names = "(?is)(?:MODIFY|RESET)\\s+SETTINGS?\\s+(.+?);?\\s*$".r
          .findFirstMatchIn(chQuery).map(m => splitArgs(m.group(1))
            .map(_.trim.takeWhile(c => c.isLetterOrDigit || c == '_'))
            .filter(_.nonEmpty)).getOrElse(Seq.empty)
        for (n <- names if !knownTableSettings.contains(n.toLowerCase))
          throw new IllegalArgumentException(
            s"UNKNOWN_SETTING: unknown table setting '$n'")
        Some(spark.range(0).toDF("ok"))
      case alterClearColRe(name, colName) =>
        // CLEAR COLUMN resets values to the column DEFAULT (declared
        // expression if any, else the TYPE default; reference
        // AlterCommands CLEAR -> default materialization)
        import org.apache.spark.sql.types._
        val t = spark.table(name)
        val f = t.schema(colName)
        val fill = tableDefaults.getOrElse(name, Seq.empty).toMap.get(colName)
          .map(e => org.apache.spark.sql.functions.expr(rewrite(e))
            .cast(f.dataType))
          .getOrElse(f.dataType match {
            case _ if f.metadata.contains("ch_nullable") =>
              org.apache.spark.sql.functions.lit(null).cast(f.dataType)
            case StringType | BinaryType =>
              org.apache.spark.sql.functions.lit("").cast(f.dataType)
            case DateType =>
              org.apache.spark.sql.functions.expr("DATE'1970-01-01'")
            case _: TimestampType | TimestampNTZType =>
              org.apache.spark.sql.functions.expr("to_timestamp(0)")
            case _: ArrayType =>
              org.apache.spark.sql.functions.expr("array()").cast(f.dataType)
            case _: MapType =>
              org.apache.spark.sql.functions.expr("map()").cast(f.dataType)
            case _: NumericType =>
              org.apache.spark.sql.functions.lit(0).cast(f.dataType)
            case _ => org.apache.spark.sql.functions.lit(null).cast(f.dataType)
          })
        val cleared = t.withColumn(colName, fill)
        cleared.createOrReplaceTempView(name); engineBacking.remove(name)
        Some(cleared.limit(0))
      case alterCommentColRe(name, col0, cmt) =>
        // comments are metadata-only: record for SHOW CREATE / DESCRIBE
        // (on every replica sharing the zookeeper path)
        val col = col0.stripPrefix("`").stripSuffix("`")
        replicaSiblings(name).foreach { t =>
          val cur = tableColExtras.getOrElse(t, Map.empty)
          val (_, codec, ttl) = cur.getOrElse(col, ("", "", ""))
          tableColExtras.put(t, cur + (col -> (cmt, codec, ttl)))
        }
        Some(spark.table(name).limit(0))
      case renameTableRe(from, to) =>
        val t = spark.table(from)
        t.createOrReplaceTempView(to)
        spark.catalog.dropTempView(from)
        if (graft.core.Tables.all.contains(from))
          graft.core.Tables.invalidateRegistered(spark)
        tableTtls.remove(from).foreach(ttl => tableTtls.put(to, ttl))
        Some(t.limit(0))
      // lightweight DELETE (reference InterpreterDeleteQuery): same row
      // semantics as ALTER DELETE here; parts keep their names (the
      // reference masks rows via _row_exists rather than rewriting)
      case q2 if "(?is)^\\s*DELETE\\s+FROM\\s+\\w+\\s+WHERE\\b.*$".r
          .pattern.matcher(q2).matches =>
        val m = "(?is)^\\s*DELETE\\s+FROM\\s+(\\w+)\\s+WHERE\\s+(.*?);?\\s*$".r
          .findFirstMatchIn(q2).get
        // a `__vt_` name means the shadow-routing pass rewrote the FROM:
        // resolve back to the base table so BOTH it and the shadow shrink
        val (name, pred) = (m.group(1).stripPrefix("__vt_"), m.group(2))
        // the reference rejects lightweight DELETE on views
        // (InterpreterDeleteQuery: BAD_ARGUMENTS for non-MergeTree)
        if (matViews.values.exists(_.exists(_._1 == name)))
          throw new IllegalArgumentException(
            s"BAD_ARGUMENTS: DELETE is not supported for view '$name'")
        val predR = rewrite(pred)
        // a predicate over _part/_partition_id only resolves against the
        // shadow — filter there and project the main view from it
        val usesVirtual = virtualColNames.exists(c =>
          ("(?<![\\w])" + c + "\\b").r.findFirstIn(pred).isDefined)
        virtualShadow.get(name) match {
          case Some(sh) if usesVirtual =>
            val keptSh = sh.filter(s"NOT ($predR)")
            virtualShadow.put(name, keptSh)
            val kept = keptSh.select(spark.table(name).columns.map(c =>
              org.apache.spark.sql.functions.col(s"`$c`")): _*)
            kept.createOrReplaceTempView(name); engineBacking.remove(name)
            Some(kept.limit(0))
          case shOpt =>
            val kept = spark.table(name).filter(s"NOT ($predR)")
            kept.createOrReplaceTempView(name); engineBacking.remove(name)
            shOpt.foreach { sh =>
              try virtualShadow.put(name, sh.filter(s"NOT ($predR)"))
              catch { case scala.util.control.NonFatal(_) =>
                virtualShadow.remove(name) }
            }
            Some(kept.limit(0))
        }
      case alterDelRe(name, pred) =>
        val kept = spark.table(name)
          .filter(s"NOT (${rewrite(pred)})")
        kept.createOrReplaceTempView(name); engineBacking.remove(name)
        // the mutation applies to the virtual-column shadow too: rows
        // filtered, and every active part stamped with the new data
        // version (all_1_1_0 -> all_1_1_0_<v>)
        virtualShadow.get(name).foreach { sh =>
          try virtualShadow.put(name, sh.filter(s"NOT (${rewrite(pred)})"))
          catch { case scala.util.control.NonFatal(_) =>
            virtualShadow.remove(name) }
        }
        renameShadowParts(name, ChParts.mutate(name))
        Some(kept.limit(0))
      case alterUpdRe(name, assigns, pred) =>
        val t = spark.table(name)
        // col = expr pairs, split at paren-depth 0
        val updates = splitArgs(assigns).map { a =>
          val i = a.indexOf('=')
          a.take(i).trim -> rewrite(a.drop(i + 1).trim)
        }.toMap
        // the reference forbids mutating Dynamic/JSON/Variant columns
        for (c <- updates.keys if dynamicCols.getOrElse(name, Set.empty)(c))
          throw new IllegalArgumentException(
            s"CANNOT_UPDATE_COLUMN: $c has a dynamic type")
        val p = rewrite(pred)
        val projected = t.columns.map { c =>
          updates.get(c) match {
            case Some(e) => s"CASE WHEN ($p) THEN ($e) ELSE $c END AS $c"
            case None => c
          }
        }.mkString(", ")
        val updated = spark.sql(s"SELECT $projected FROM $name")
        updated.createOrReplaceTempView(name); engineBacking.remove(name)
        // same mutation on the virtual-column shadow (keeps _part reads
        // consistent after ALTER UPDATE; drop it if the expr won't apply)
        virtualShadow.get(name).foreach { sh =>
          try {
            val shProj = sh.columns.map { c =>
              updates.get(c) match {
                case Some(e) => s"CASE WHEN ($p) THEN ($e) ELSE $c END AS $c"
                case None => s"`$c`"
              }
            }.mkString(", ")
            sh.createOrReplaceTempView("__vt_mut_" + name)
            virtualShadow.put(name,
              spark.sql(s"SELECT $shProj FROM __vt_mut_$name"))
          } catch { case scala.util.control.NonFatal(_) =>
            virtualShadow.remove(name) }
        }
        renameShadowParts(name, ChParts.mutate(name))
        Some(updated.limit(0))
      case truncateRe(name) =>
        val empty = spark.table(name).limit(0)
        empty.createOrReplaceTempView(name); engineBacking.remove(name)
        ChParts.truncate(name)
        virtualShadow.get(name).foreach(s => virtualShadow.put(name, s.limit(0)))
        Some(empty)
      case optimizeDedupRe(name, byCols0) =>
        val byCols = byCols0
        ChParts.optimize(name, None) // parts merge; rows change below
        virtualShadow.remove(name)
        val t = spark.table(name)
        val deduped = Option(byCols) match {
          case Some(cs) =>
            t.dropDuplicates(cs.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq)
          case None => t.distinct()
        }
        val m = deduped.persist()
        m.count()
        m.createOrReplaceTempView(name); engineBacking.remove(name)
        Some(m.limit(0))
      case optimizeRe(name) =>
        // a merge point: apply the engine family's merge semantics
        // (Summing/Replacing/Collapsing…) recorded at CREATE, then any
        // registered TTL (the reference drops expired rows during
        // merges). Parts bookkeeping: merge each (selected) partition's
        // active parts into one, rename the shadow's _part accordingly.
        locally {
          val pidOpt = ("(?is)\\bPARTITION\\s+(?:ID\\s+)?('([^']*)'|\\w+)").r
            .findFirstMatchIn(chQuery)
            .map(m => Option(m.group(2)).getOrElse(m.group(1)))
            .filterNot(_.equalsIgnoreCase("tuple()"))
          val fin = "(?i)\\bFINAL\\b".r.findFirstIn(chQuery).isDefined
          renameShadowParts(name, ChParts.optimize(name, pidOpt, fin))
        }
        engineFinalDf(spark, name).foreach { d =>
          val m = d.persist(); m.count(); m.createOrReplaceTempView(name); engineBacking.remove(name)
        }
        tableTtls.get(name) match {
          case Some(ttl) =>
            val kept = spark.table(name)
              .filter(s"NOT ((${rewrite(ttl)}) <= current_timestamp())")
            val m = kept.persist()
            val keptRows = m.count()
            m.createOrReplaceTempView(name); engineBacking.remove(name)
            // TTL merges drop rows — re-pin the merged part's count and
            // apply the same filter to the virtual-column shadow
            ChParts.recountActive(name, keptRows)
            virtualShadow.get(name).foreach { sh =>
              try virtualShadow.put(name,
                sh.filter(s"NOT ((${rewrite(ttl)}) <= current_timestamp())"))
              catch { case scala.util.control.NonFatal(_) =>
                virtualShadow.remove(name) }
            }
            Some(m.limit(0))
          case None => Some(spark.table(name).limit(0))
        }
      case _ => None
    }
    ddl match {
      case Some(df) => return df
      case None => ()
    }
    // EXPLAIN [SYNTAX|PLAN|PIPELINE|...] (reference
    // src/Interpreters/InterpreterExplainQuery.cpp): SYNTAX returns the
    // dialect-rewritten Spark SQL text (the analog of CH's rewritten
    // AST); the plan variants return the formatted Catalyst plan.
    val explainRe = "(?is)^\\s*EXPLAIN(\\s+(SYNTAX|AST|PLAN|PIPELINE|ESTIMATE))?\\s+(.*)$".r
    chQuery match {
      case explainRe(_, mode, inner)
          if mode != null && mode.equalsIgnoreCase("ESTIMATE") &&
            "(?is)\\bFROM\\s+(\\w+)".r.findFirstMatchIn(inner)
              .map(_.group(1).stripPrefix("__vt_")).exists(t =>
                ChParts.isTracked(t) && virtualShadow.contains(t)) =>
        // EXPLAIN ESTIMATE (reference InterpreterExplainQuery Estimate):
        // per-table scan estimate AFTER partition pruning — a part is
        // read iff any of its rows can match, so on partition-aligned
        // predicates the shadow's per-part match count IS the estimate
        import spark.implicits._
        val t = "(?is)\\bFROM\\s+(\\w+)".r.findFirstMatchIn(inner).get
          .group(1).stripPrefix("__vt_")
        val whereOpt = "(?is)\\bWHERE\\s+(.*?)(?:\\s+(?:GROUP|ORDER|LIMIT|SETTINGS|FORMAT)\\b.*)?$".r
          .findFirstMatchIn(inner).map(_.group(1).trim)
        val sh = virtualShadow(t)
        sh.createOrReplaceTempView("__vt_" + t)
        val matched = whereOpt match {
          case Some(w) =>
            spark.sql(s"SELECT DISTINCT _part FROM __vt_$t WHERE ${rewrite(w)}")
              .collect().map(_.getString(0)).toSet
          case None => ChParts.partsOf(t).filter(_.state == "Active")
            .map(_.name).toSet
        }
        val ps = ChParts.partsOf(t).filter(p =>
          p.state == "Active" && matched(p.name))
        Seq(("default", t, ps.length.toLong, ps.map(_.rows).sum,
          ps.map(_.marks).sum))
          .toDF("database", "table", "parts", "rows", "marks")
      case explainRe(_, mode, inner) =>
        import spark.implicits._
        val rewritten = rewrite(expandColumnsTransformers(spark, inner))
          .replaceAll("""(?i)\bsystem\.numbers\b""", "system_numbers")
          .replaceAll("""(?i)\bsystem\.one\b""", "system_one")
          .replaceAll("""(?i)\bsystem\.tables\b""", "system_tables")
          .replaceAll("""(?i)\bsystem\.columns\b""", "system_columns")
        if (mode != null && mode.equalsIgnoreCase("SYNTAX"))
          Seq(rewritten).toDF("explain")
        else {
          val mode2 = if (mode != null && mode.equalsIgnoreCase("PIPELINE"))
            org.apache.spark.sql.execution.ExtendedMode
          else org.apache.spark.sql.execution.FormattedMode
          Seq(spark.sql(rewritten).queryExecution.explainString(mode2)).toDF("explain")
        }
      case _ =>
        tryWithFill(spark, dir, chQuery) match {
          case Some(df) => df
          case None =>
            val q = rewrite(expandColumnsTransformers(spark, chQuery))
              .replaceAll("""(?i)\bsystem\.numbers\b""", "system_numbers")
              .replaceAll("""(?i)\bsystem\.one\b""", "system_one")
              .replaceAll("""(?i)\bsystem\.tables\b""", "system_tables")
              .replaceAll("""(?i)\bsystem\.columns\b""", "system_columns")
            try spark.sql(q)
            catch {
              // a FROM-less SELECT reads system.one in the reference, so
              // bare `dummy` (its only column, always 0) resolves there;
              // substitute the constant and retry (a real table's dummy
              // column resolves normally and never reaches this path)
              case e: org.apache.spark.sql.AnalysisException
                  if Option(e.getMessage).exists(_.contains("`dummy`")) &&
                    "(?i)(?<![\\w.`])dummy(?![\\w`])".r.findFirstIn(q).isDefined =>
                spark.sql(
                  "(?i)(?<![\\w.`])dummy(?![\\w`])".r.replaceAllIn(q, "0"))
            }
        }
    }
  }
}
