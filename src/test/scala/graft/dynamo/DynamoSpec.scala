package graft.dynamo

import java.time.LocalDate

import graft.databricks.{HttpTransport, Json}
import graft.pipeline.RunRecord
import org.scalatest.funsuite.AnyFunSuite

/** DynamoDB bookkeeping over the HTTP seam: SigV4 pinned against the
  * AWS documentation's own test vector, request shapes + signature
  * round-trip verified by a scripted in-memory DynamoDB, and the
  * BookkeeperStore semantics (newest-wins, skip-if-done,
  * cross-instance visibility, pagination). */
class DynamoSpec extends AnyFunSuite {

  private val d = LocalDate.parse("2024-04-01")

  test("SigV4: the public AWS docs test vector reproduces exactly") {
    // docs.aws.amazon.com 'Signature Version 4 signing process' example:
    // GET https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08
    val headers = Seq(
      "Content-Type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "Host" -> "iam.amazonaws.com",
      "X-Amz-Date" -> "20150830T123600Z")
    val creq = SigV4.canonicalRequest("GET", "/",
      "Action=ListUsers&Version=2010-05-08", headers, SigV4.sha256Hex(Array.empty))
    assert(SigV4.sha256Hex(creq.getBytes("UTF-8")) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59",
      s"canonical request drifted:\n$creq")
    val auth = SigV4.authorization("GET", "/", "Action=ListUsers&Version=2010-05-08",
      headers, Array.empty, "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      "us-east-1", "iam", "20150830T123600Z")
    assert(auth.endsWith(
      "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"), auth)
    assert(auth.contains("Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request"), auth)
    assert(auth.contains("SignedHeaders=content-type;host;x-amz-date"), auth)
  }

  /** In-memory DynamoDB speaking the wire protocol: routes on
    * X-Amz-Target, VERIFIES each request's signature by re-deriving it
    * with the shared secret (a header-ordering or hashing bug anywhere
    * in the client fails every call), and implements the subset the
    * bookkeeper uses, including Query pagination. */
  private final class FakeDynamo(pageSize: Int = 1000) extends HttpTransport {
    val tables = collection.mutable.Map.empty[String, collection.mutable.ArrayBuffer[Map[String, (String, String)]]]
    /** >0: that many DescribeTable calls answer TableStatus=CREATING. */
    var creatingPolls = 0
    // table -> (hashKey, rangeKey) from CreateTable: PutItem REPLACES
    // by primary key like the real service, not append
    val keySchemas = collection.mutable.Map.empty[String, (String, Option[String])]
    var calls = 0

    private def attr(av: Any): (String, String) = {
      val m = av.asInstanceOf[Map[String, Any]].head
      (m._1, String.valueOf(m._2))
    }

    override def post(url: String, body: String, headers: Map[String, String]): (Int, String) = {
      calls += 1
      // signature round-trip: re-derive with the same inputs
      val amzDate = headers("X-Amz-Date")
      val expect = SigV4.authorization("POST", "/", "",
        Seq("content-type" -> headers("Content-Type"),
          "host" -> java.net.URI.create(url).getAuthority,
          "x-amz-date" -> amzDate,
          "x-amz-target" -> headers("X-Amz-Target")),
        body.getBytes("UTF-8"), "AK", "SK", "eu-west-1", "dynamodb", amzDate)
      if (headers("Authorization") != expect)
        return (403, """{"__type":"InvalidSignatureException"}""")
      val req = Json.parseObj(body)
      val tname = req("TableName").asInstanceOf[String]
      headers("X-Amz-Target").stripPrefix("DynamoDB_20120810.") match {
        case "DescribeTable" =>
          if (tables.contains(tname)) {
            // scriptable CREATING phase (real CreateTable is async):
            // the first `creatingPolls` describes answer CREATING
            val status = if (creatingPolls > 0) { creatingPolls -= 1; "CREATING" } else "ACTIVE"
            (200, s"""{"Table": {"TableName": ${Json.str(tname)}, "TableStatus": ${Json.str(status)}}}""")
          }
          else (400, """{"__type":"com.amazonaws.dynamodb.v20120810#ResourceNotFoundException"}""")
        case "CreateTable" =>
          tables.getOrElseUpdate(tname, collection.mutable.ArrayBuffer.empty)
          val keys = req("KeySchema").asInstanceOf[List[Any]]
            .map(_.asInstanceOf[Map[String, Any]])
            .map(m => m("KeyType").asInstanceOf[String] -> m("AttributeName").asInstanceOf[String])
            .toMap
          keySchemas(tname) = (keys("HASH"), keys.get("RANGE"))
          (200, "{}")
        case "PutItem" =>
          val item = req("Item").asInstanceOf[Map[String, Any]].map { case (k, v) => k -> attr(v) }
          val (hk, rk) = keySchemas.getOrElse(tname, ("tableName", Some("infoDateSortKey")))
          def keyOf(i: Map[String, (String, String)]) = (i.get(hk), rk.flatMap(i.get))
          val buf = tables(tname)
          val existingIdx = buf.indexWhere(keyOf(_) == keyOf(item))
          // ConditionExpression subset: "attribute_not_exists(pk) OR attr < :v"
          val condOk = req.get("ConditionExpression").forall { c =>
            val expr = c.asInstanceOf[String]
            if (existingIdx < 0) true // attribute_not_exists satisfied
            else {
              val m = "OR\\s+(\\w+)\\s*<\\s*(:\\w+)".r.findFirstMatchIn(expr).get
              val (tpe, v) = attr(req("ExpressionAttributeValues")
                .asInstanceOf[Map[String, Any]](m.group(2)))
              val (etpe, ev) = buf(existingIdx)(m.group(1))
              require(etpe == tpe, s"type mismatch $etpe vs $tpe")
              if (tpe == "N") BigDecimal(ev) < BigDecimal(v) else ev < v
            }
          }
          if (!condOk)
            (400, """{"__type":"com.amazonaws.dynamodb.v20120810#ConditionalCheckFailedException"}""")
          else {
            if (existingIdx >= 0) buf(existingIdx) = item else buf += item
            (200, "{}")
          }
        case "Query" =>
          val vals = req("ExpressionAttributeValues").asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> attr(v)._2 }
          val cond = req("KeyConditionExpression").asInstanceOf[String]
          val base = tables(tname).filter(_.get("tableName").exists(_._2 == vals(":t")))
          val selected =
            if (cond.contains("begins_with"))
              base.filter(_.get("infoDateSortKey").exists(_._2.startsWith(vals(":p"))))
            else base
          page(selected.toSeq, req)
        case "Scan" =>
          page(tables(tname).toSeq, req)
        case other => (400, s"""{"__type":"UnknownOperationException","op":"$other"}""")
      }
    }

    private def encode(item: Map[String, (String, String)]): String =
      Json.obj(item.toSeq.sortBy(_._1).map { case (k, (t, v)) =>
        k -> Json.obj(t -> Json.str(v))
      }: _*)

    private def page(items: Seq[Map[String, (String, String)]], req: Map[String, Any]): (Int, String) = {
      val sorted = items.sortBy(i => i.get("infoDateSortKey").map(_._2).getOrElse(""))
      val start = req.get("ExclusiveStartKey").map { k =>
        val sk = attr(k.asInstanceOf[Map[String, Any]]("infoDateSortKey"))._2
        sorted.indexWhere(_.get("infoDateSortKey").exists(_._2 == sk)) + 1
      }.getOrElse(0)
      val slice = sorted.slice(start, start + pageSize)
      val last = if (start + pageSize < sorted.length && slice.nonEmpty)
        s""", "LastEvaluatedKey": ${encode(Map("infoDateSortKey" -> slice.last("infoDateSortKey")))}"""
      else ""
      (200, s"""{"Items": [${slice.map(encode).mkString(",")}]$last}""")
    }

    override def get(url: String, headers: Map[String, String]): (Int, String) =
      throw new IllegalStateException("DynamoDB data plane is POST-only")
  }

  private def client(fake: FakeDynamo) = new DynamoDbClient(
    "https://dynamodb.eu-west-1.amazonaws.com", "eu-west-1", "AK", "SK", fake)

  test("bookkeeper: table auto-created, newest attempt wins, skip-if-done, cross-instance visibility") {
    val fake = new FakeDynamo()
    val bk = new BookkeeperDynamo(client(fake))
    assert(fake.tables.contains("graft_bookkeeping"), "ensureTable must create on first use")
    bk.record(RunRecord("t", d, 1, "failed", 1, 100))
    bk.record(RunRecord("t", d, 2, "succeeded", 2, 200))
    bk.record(RunRecord("t", d.plusDays(1), 3, "skipped", 3, 300))
    bk.record(RunRecord("u", d, 9, "failed", 4, 400))
    assert(bk.get("t", d).map(_.recordCount).contains(2L), "newest attempt must win")
    assert(bk.isAlreadyRan("t", d) && bk.isAlreadyRan("t", d.plusDays(1)),
      "succeeded and skipped are both durably done")
    assert(!bk.isAlreadyRan("u", d))
    assert(bk.latestSuccess("t").contains(d))
    assert(bk.latestSuccessRecord("t", d).map(_.recordCount).contains(2L))
    assert(bk.all.size == 3, "one reduced record per (table, date)")
    // a second driver instance sees everything through storage
    val bk2 = new BookkeeperDynamo(client(fake))
    assert(bk2.isAlreadyRan("t", d))
  }

  test("query pagination: a journal larger than one page reads complete") {
    val fake = new FakeDynamo(pageSize = 7)
    val bk = new BookkeeperDynamo(client(fake))
    (0 until 23).foreach(i =>
      bk.record(RunRecord("t", d.plusDays(i.toLong), i.toLong, "succeeded", i.toLong, i.toLong)))
    assert(bk.all.size == 23, "LastEvaluatedKey pagination must be followed")
    assert(bk.latestSuccess("t").contains(d.plusDays(22)))
  }

  test("config: bookkeeping.dynamodb.* parses lazily; missing required keys fail the LOAD") {
    val parsed = graft.pipeline.PipelineConfig.parse(
      """bookkeeping.dynamodb.endpoint = https://dynamodb.eu-west-1.amazonaws.com
        |bookkeeping.dynamodb.region = eu-west-1
        |bookkeeping.dynamodb.access.key = AK
        |bookkeeping.dynamodb.secret.key = SK
        |allow.empty.pipeline = true
        |""".stripMargin)
    assert(parsed.dynamoBookkeeping.isDefined, "factory must be declared")
    val e = intercept[IllegalArgumentException](graft.pipeline.PipelineConfig.parse(
      """bookkeeping.dynamodb.endpoint = https://dynamodb.eu-west-1.amazonaws.com
        |allow.empty.pipeline = true
        |""".stripMargin))
    assert(e.getMessage.contains("bookkeeping.dynamodb.region"), e.getMessage)
  }

  test("offsets: server-side monotonic commits — stale commits no-op, types round-trip") {
    import graft.offset.OffsetValue
    val fake = new FakeDynamo()
    val os = new OffsetStoreDynamo(client(fake))
    assert(os.getLatestOffset("ev").isEmpty)
    os.commit("ev", OffsetValue.IntegralValue(100L))
    os.commit("ev", OffsetValue.IntegralValue(50L))   // stale: conditional put rejects
    assert(os.getLatestOffset("ev").contains(OffsetValue.IntegralValue(100L)),
      "a lower offset must never overwrite (condition evaluated server-side)")
    os.commit("ev", OffsetValue.IntegralValue(250L))
    assert(os.getLatestOffset("ev").contains(OffsetValue.IntegralValue(250L)))
    // numeric comparison, not lexicographic: 1000 > 999 even though "1000" < "999"
    os.commit("n", OffsetValue.IntegralValue(999L))
    os.commit("n", OffsetValue.IntegralValue(1000L))
    assert(os.getLatestOffset("n").contains(OffsetValue.IntegralValue(1000L)),
      "N attributes must compare numerically")
    os.commit("s", OffsetValue.StringValue("2024-01-02"))
    os.commit("s", OffsetValue.StringValue("2024-01-01"))
    assert(os.getLatestOffset("s").contains(OffsetValue.StringValue("2024-01-02")))
    os.commit("ts", OffsetValue.DateTimeValue(1700000000000L))
    assert(os.getLatestOffset("ts").contains(OffsetValue.DateTimeValue(1700000000000L)))
  }

  test("an EXISTING table still in CREATING state is awaited, not written to (r17 review)") {
    // driver A issued CreateTable seconds ago (table exists, CREATING);
    // driver B's ensureTable used to skip the ACTIVE wait on the
    // exists path and B's first PutItem died with ResourceNotFound
    val fake = new FakeDynamo()
    val c = client(fake)
    c.createTable("graft_bookkeeping", "tableName", Some("infoDateSortKey"))
    fake.creatingPolls = 2 // the next driver sees CREATING twice
    val bk = new BookkeeperDynamo(c) // constructor ensureTable must wait
    assert(fake.creatingPolls == 0, "ensureTable must poll through the CREATING phase")
    bk.record(graft.pipeline.RunRecord("t", d, 1L, "succeeded", 1L, 2L))
    assert(bk.get("t", d).map(_.recordCount).contains(1L))
  }

  test("a corrupted signature is rejected by the fake — the signature check is real") {
    val fake = new FakeDynamo()
    val bad = new DynamoDbClient(
      "https://dynamodb.eu-west-1.amazonaws.com", "eu-west-1", "AK", "WRONG-SECRET", fake)
    val e = intercept[RuntimeException](
      bad.call("DescribeTable", Json.obj("TableName" -> Json.str("x"))))
    assert(e.getMessage.contains("403"), e.getMessage)
  }
}
