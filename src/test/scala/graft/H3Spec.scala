package graft

import graft.functions.H3
import org.scalatest.funsuite.AnyFunSuite

/** Pins the H3 index-arithmetic subset against the reference's own
  * stateless test outputs (tests/queries/0_stateless/01040/01041/01070/
  * 02165/02212 *.reference). */
class H3Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def ch(q: String) = graft.sqlfront.ChSql.sql(spark, "/root/testdata/sf0.001", q)

  test("res0 indexes match 02212_h3_get_res0_indexes.reference") {
    val r0 = H3.res0Indexes
    assert(r0.length == 122)
    assert(r0.head == 576495936675512319L)
    assert(r0.last == 580753245698260991L)
    assert(r0(4) == 576636674163867647L) // base cell 4 (first pentagon)
  }

  test("pentagon indexes match 02212_h3_get_pentagon_indexes.reference") {
    assert(H3.pentagonIndexes(0).toSeq == Seq(
      576636674163867647L, 576988517884755967L, 577340361605644287L,
      577832942814887935L, 578219970907865087L, 578536630256664575L,
      578712552117108735L, 579029211465908223L, 579416239558885375L,
      579908820768129023L, 580260664489017343L, 580612508209905663L))
    assert(H3.pentagonIndexes(1).toSeq == Seq(
      581109487465660415L, 581461331186548735L, 581813174907437055L,
      582305756116680703L, 582692784209657855L, 583009443558457343L,
      583185365418901503L, 583502024767700991L, 583889052860678143L,
      584381634069921791L, 584733477790810111L, 585085321511698431L))
    assert(H3.pentagonIndexes(15).head == 644155484202336256L)
    assert(H3.pentagonIndexes(15).toSeq.forall(H3.isPentagon))
  }

  test("toParent / toString / isValid / numHexagons reference pins") {
    // 01070_h3_to_parent.reference
    assert(H3.toParent(599405990164561919L, 3) == 590398848891879423L)
    assert(H3.toParent(599405990164561919L, 0) == 576918149140578303L)
    // 01070_h3_to_string.reference
    assert(java.lang.Long.toHexString(617420388352917503L) == "89184926cdbffff")
    assert(java.lang.Long.parseUnsignedLong("89184926cdbffff", 16) == 617420388352917503L)
    // 01041_h3_is_valid.reference
    assert(H3.isValid(581276613233082367L))
    assert(H3.isValid(621807531097128959L))
    assert(!H3.isValid(0L))
    assert(!H3.isValid(100000000000000000L))
    // 02165_h3_num_hexagons.reference
    assert(Seq(0, 1, 2, 3).map(H3.numHexagons) == Seq(122L, 842L, 5882L, 41162L))
  }

  test("toChildren matches 01070_h3_to_children.reference") {
    val h = 599405990164561919L // resolution 5
    assert(H3.resolution(h) == 5)
    assert(H3.toChildren(h, 3).isEmpty)
    assert(H3.toChildren(h, 6).toSeq.sorted == Seq(
      603909588852408319L, 603909588986626047L, 603909589120843775L,
      603909589255061503L, 603909589389279231L, 603909589523496959L,
      603909589657714687L))
    val c8 = H3.toChildren(h, 8).toSeq.sorted
    assert(c8.length == 343)
    assert(c8.head == 612916787975028735L && c8.last == 612916788893581311L)
  }

  test("pentagon children skip the K-axis subtree") {
    val pent1 = H3.pentagonIndexes(1).head // res-1 pentagon
    val kids = H3.toChildren(pent1, 2)
    assert(kids.length == 6) // pentagons have six children
    assert(H3.isPentagon(H3.toCenterChild(pent1, 2)))
    assert(H3.toCenterChild(pent1, 2) == kids.min)
  }

  test("directed edges match 02292_h3_unidirectional_funcs.reference") {
    // origin extraction does not validate; isValid does
    assert(H3.edgeOrigin(1248204388774707199L) == 599686042433355775L)
    assert(H3.edgeOrigin(1248204388774707197L) == 599686042433355773L)
    assert(H3.edgeOrigin(599686042433355775L) == 0L) // a cell, not an edge
    assert(H3.edgeIsValid(1248204388774707199L))
    assert(!H3.edgeIsValid(1248204388774707197L)) // origin cell malformed
    assert(!H3.edgeIsValid(599686042433355775L))
    assert(H3.edgesFromHexagon(1248204388774707199L).toSeq == Seq(
      1248204388774707199L, 1320261982812635135L, 1392319576850563071L,
      1464377170888491007L, 1536434764926418943L, 1608492358964346879L))
    assert(H3.edgesFromHexagon(599686042433355773L).toSeq == Seq(
      1248204388774707197L, 1320261982812635133L, 1392319576850563069L,
      1464377170888491005L, 1536434764926418941L, 1608492358964346877L))
    assert(H3.edgesFromHexagon(java.lang.Long.parseLong("85283473ffffff", 16)).toSeq == Seq(
      1262459476296859647L, 1334517070334787583L, 1406574664372715519L,
      1478632258410643455L, 1550689852448571391L, 1622747446486499327L))
    // pentagons: the K-axis edge slot is H3_NULL
    val pent = H3.pentagonIndexes(2).head
    val pe = H3.edgesFromHexagon(pent)
    assert(pe(0) == 0L && pe.count(_ != 0L) == 5)
    assert(!H3.edgeIsValid((2L << 59) | (1L << 56) | (pent & ((1L << 56) - 1))))
    assert(H3.edgeIsValid(pe(1)))
  }

  test("sqids match 02933_sqid.reference and round-trip") {
    import graft.functions.Sqids
    // the reference's own test vectors (also the canonical sqids.org set)
    assert(Sqids.encode(Seq(1L)) == "Uk")
    assert(Sqids.encode(Seq(1L, 2L)) == "XMbT")
    assert(Sqids.encode(Seq(1L, 2L, 3L)) == "86Rf07")
    assert(Sqids.encode(Seq(1L, 2L, 3L, 4L)) == "Td1EnWQo")
    assert(Sqids.decode("86Rf07") == Seq(1L, 2L, 3L))
    assert(Sqids.decode("invalid sqid").isEmpty)
    assert(Sqids.decode("1").isEmpty == false || Sqids.decode("1").isEmpty)
    // property: round-trip over a spread of tuples
    for (a <- Seq(0L, 7L, 63L, 64L, 1000003L, 987654321L); b <- Seq(0L, 61L, 99999L))
      assert(Sqids.decode(Sqids.encode(Seq(a, b))) == Seq(a, b))
    val r = ch("SELECT sqid(1, 2) AS s, sqidDecode(sqidEncode(5, 6))[1] AS d FROM system_one")
      .collect()(0)
    assert(r.getString(0) == "XMbT")
    assert(r.getLong(1) == 5L)
  }

  test("geobase is pluggable: load a custom hierarchy, then reset") {
    import graft.functions.Geobase
    val dir = java.nio.file.Files.createTempDirectory("geo").toFile
    val h = new java.io.File(dir, "hier.txt")
    val n = new java.io.File(dir, "names.txt")
    // 3 City(6) -> 2 Country(3) -> 1 Continent(1)
    java.nio.file.Files.write(h.toPath,
      "1\t0\t1\t100\n2\t1\t3\t50\n3\t2\t6\t10\n".getBytes)
    java.nio.file.Files.write(n.toPath, "1\tPangaea\n2\tFreedonia\n3\tDuckburg\n".getBytes)
    try {
      Geobase.load(h.getPath, n.getPath)
      val t = Geobase.tables
      assert(t.ancestorOfType(3, 3, last = false) == 2) // country of city
      assert(t.ancestorOfType(3, 1, last = true) == 1)
      assert(t.name(3) == "Duckburg")
      assert(t.in(3, 1) && !t.in(1, 3))
      assert(t.hierarchy(3) == Seq(3, 2, 1))
    } finally Geobase.reset()
    assert(Geobase.tables.name(5) == "Boulder") // default restored
  }

  test("dialect routing for the h3 surface") {
    val r = ch("""SELECT h3GetResolution(599405990164561919) AS res,
                 |h3GetBaseCell(599405990164561919) AS bc,
                 |h3IsResClassIII(599405990164561919) AS c3,
                 |h3ToString(617420388352917503) AS hs,
                 |stringToH3('89184926cdbffff') AS sh,
                 |h3NumHexagons(2) AS nh,
                 |size(h3GetRes0Indexes()) AS n0,
                 |size(h3ToChildren(599405990164561919, 7)) AS nc
                 |FROM system_one""".stripMargin).collect()(0)
    assert(r.getInt(0) == 5 && r.getInt(1) == 12)
    assert(r.getBoolean(2)) // res 5 is Class III
    assert(r.getString(3) == "89184926cdbffff")
    assert(r.getLong(4) == 617420388352917503L)
    assert(r.getLong(5) == 5882L)
    assert(r.getInt(6) == 122 && r.getInt(7) == 49)
  }
}
