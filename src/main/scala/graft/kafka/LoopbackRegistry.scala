package graft.kafka

import graft.databricks.Json

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/**
 * In-process Confluent Schema Registry speaking the public REST API
 * over a live JDK HTTP server — the registry-side counterpart of
 * [[LoopbackBroker]], so the full KafkaAvroSource/KafkaAvroSink
 * lifecycle (register → frame → produce → fetch → resolve → decode)
 * runs end to end in a zero-egress environment. Ids are assigned
 * sequentially; registering a byte-identical schema returns the
 * existing id, which is the idempotence contract clients rely on.
 */
final class LoopbackRegistry extends AutoCloseable {
  private val byId = new ConcurrentHashMap[Int, String]()
  private val bySubject = new ConcurrentHashMap[String, Int]()
  private val nextId = new AtomicInteger(0)

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    val path = ex.getRequestURI.getPath
    val SubjLatest = "/subjects/([^/]+)/versions/latest".r
    val SchemaById = "/schemas/ids/([0-9]+)".r
    val Register = "/subjects/([^/]+)/versions".r
    def respond(code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    (ex.getRequestMethod, path) match {
      case ("GET", SubjLatest(subj)) =>
        Option(bySubject.get(java.net.URLDecoder.decode(subj, "UTF-8"))) match {
          case Some(id) if id != 0 => respond(200, Json.obj(
            "subject" -> Json.str(subj), "version" -> "1",
            "id" -> id.toString, "schema" -> Json.str(byId.get(id))))
          case _ => respond(404, """{"error_code":40401,"message":"Subject not found."}""")
        }
      case ("GET", SchemaById(id)) =>
        Option(byId.get(id.toInt)) match {
          case Some(s) => respond(200, Json.obj("schema" -> Json.str(s)))
          case None => respond(404, """{"error_code":40403,"message":"Schema not found"}""")
        }
      case ("POST", Register(subj)) =>
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        Json.parseObj(body).get("schema") match {
          case Some(schema: String) =>
            var id = 0
            val it = byId.entrySet().iterator()
            while (it.hasNext && id == 0) {
              val e = it.next()
              if (e.getValue == schema) id = e.getKey
            }
            if (id == 0) { id = nextId.incrementAndGet(); byId.put(id, schema) }
            bySubject.put(java.net.URLDecoder.decode(subj, "UTF-8"), id)
            respond(200, s"""{"id":$id}""")
          case _ => respond(422, """{"error_code":42201,"message":"Invalid schema"}""")
        }
      case _ => respond(404, """{"error_code":404,"message":"no route"}""")
    }
  })
  server.start()

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** A client bound to this registry over the real JDK transport. */
  def client: SchemaRegistryClient =
    new SchemaRegistryClient(url, new graft.databricks.JdkHttpTransport())

  override def close(): Unit = server.stop(0)
}
