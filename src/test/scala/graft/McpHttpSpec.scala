package graft

import graft.api.McpHttp
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** HTTP/SSE transport tests (`meridian-mcp/src/main.rs:254-512`):
  * auth + session lifecycle + rate limiting + body cap over a live
  * 127.0.0.1 server, JDK HttpClient as the driver. */
class McpHttpSpec extends SparkSpec {

  private implicit val formats: Formats = DefaultFormats
  private val Key = "test-key-123"
  private val client = HttpClient.newHttpClient()

  private def startServer(ratePerMin: Int = 100000,
      maxBody: Int = 2 * 1024 * 1024): McpHttp.Server =
    new McpHttp.Server(spark, Key, port = 0, ratePerMin = ratePerMin,
      maxBodyBytes = maxBody, sseHoldMs = 300L, sseKeepAliveMs = 100L)
      .start()

  private def post(port: Int, body: String, headers: Seq[(String, String)],
      path: String = "/sse"): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def rpc(method: String, id: Option[Int] = Some(1)): String =
    s"""{"jsonrpc":"2.0","method":"$method","params":{}${
      id.map(i => s""","id":$i""").getOrElse("")}}"""

  test("initialize mints a session; api key is enforced in reference order") {
    val s = startServer()
    try {
      val port = s.boundPort
      // no key on initialize -> 401 Invalid API Key (session check passes
      // because initialize mints its own session first)
      val noKey = post(port, rpc("initialize"), Seq())
      assert(noKey.statusCode == 401 && noKey.body.contains("Invalid API Key"))
      // ...and the rejected initialize must NOT have stored a session
      // (unauthenticated spam cannot grow the session map)
      assert(s.sessionCount == 0,
        "unauthenticated initialize left a session behind")
      // non-initialize with key but no session -> 401 session message
      val noSession = post(port, rpc("tools/list"), Seq("x-api-key" -> Key))
      assert(noSession.statusCode == 401 &&
        noSession.body.contains("Mcp-Session-Id"))
      // initialize with key -> 200 + Mcp-Session-Id header + protocol json
      val init = post(port, rpc("initialize"), Seq("x-api-key" -> Key))
      assert(init.statusCode == 200)
      val sid = init.headers.firstValue("Mcp-Session-Id").orElseThrow()
      val parsed = JsonMethods.parse(init.body)
      assert((parsed \ "result" \ "protocolVersion")
        .extract[String] == "2024-11-05")
      // session id usable via header, Bearer auth form accepted
      val list = post(port, rpc("tools/list"),
        Seq("Authorization" -> s"Bearer $Key", "Mcp-Session-Id" -> sid))
      assert(list.statusCode == 200)
      val tools = (JsonMethods.parse(list.body) \ "result" \ "tools")
        .asInstanceOf[JArray].arr
      assert(tools.size == 5)
      // ...and via ?sessionId= query param
      val viaQuery = post(port, rpc("ping"), Seq("x-api-key" -> Key),
        path = s"/sse?sessionId=$sid")
      assert(viaQuery.statusCode == 200)
      // a bogus session id is rejected
      val bogus = post(port, rpc("ping"),
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> "nope"))
      assert(bogus.statusCode == 401)
      // notifications -> 202 Accepted, empty body
      val note = post(port, rpc("notifications/initialized", id = None),
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> sid))
      assert(note.statusCode == 202 && note.body.isEmpty)
      // DELETE tears the session down; reuse then fails
      val del = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${port}/sse"))
        .DELETE().header("x-api-key", Key).header("Mcp-Session-Id", sid)
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode == 200)
      val afterDel = post(port, rpc("ping"),
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> sid))
      assert(afterDel.statusCode == 401)
      // deleting a session that does not exist is 404, not 200
      val delBogus = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${port}/sse"))
        .DELETE().header("x-api-key", Key)
        .header("Mcp-Session-Id", "no-such-session")
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(delBogus.statusCode == 404)
    } finally s.stop()
  }

  test("GET /sse streams the endpoint event; advertised session works; /messages is POST-only") {
    val s = startServer()
    try {
      val port = s.boundPort
      val get = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/sse"))
        .GET().header("x-api-key", Key).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode == 200)
      assert(get.headers.firstValue("Content-Type")
        .orElseThrow().startsWith("text/event-stream"))
      val body = get.body
      assert(body.contains("event: endpoint"))
      val sid = body.linesIterator
        .find(_.startsWith("data: ")).get.split("sessionId=")(1).trim
      val ping = post(port, rpc("ping"), Seq("x-api-key" -> Key),
        path = s"/messages?sessionId=$sid")
      assert(ping.statusCode == 200)
      // GET with a session header is rejected (main.rs:427-429)
      val withSid = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/sse"))
        .GET().header("x-api-key", Key).header("Mcp-Session-Id", sid)
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(withSid.statusCode == 405)
      // /messages accepts only POST
      val getMessages = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/messages"))
        .GET().header("x-api-key", Key).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(getMessages.statusCode == 405)
    } finally s.stop()
  }

  test("rate limit answers 429; body cap answers 413; e2e tool call runs") {
    val limited = startServer(ratePerMin = 2)
    try {
      val port = limited.boundPort
      val init = post(port, rpc("initialize"), Seq("x-api-key" -> Key))
      assert(init.statusCode == 200)
      val sid = init.headers.firstValue("Mcp-Session-Id").orElseThrow()
      val second = post(port, rpc("ping"),
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> sid))
      assert(second.statusCode == 200)
      val third = post(port, rpc("ping"),
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> sid))
      assert(third.statusCode == 429 &&
        third.body.contains("Rate limit exceeded"))
    } finally limited.stop()

    val small = startServer(maxBody = 256)
    try {
      val port = small.boundPort
      val init = post(port, rpc("initialize"), Seq("x-api-key" -> Key))
      val sid = init.headers.firstValue("Mcp-Session-Id").orElseThrow()
      val big = post(port,
        s"""{"jsonrpc":"2.0","method":"ping","params":{"pad":"${"x" * 500}"},"id":1}""",
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> sid))
      assert(big.statusCode == 413)
    } finally small.stop()

    val normal = startServer()
    try {
      val port = normal.boundPort
      val init = post(port, rpc("initialize"), Seq("x-api-key" -> Key))
      val sid = init.headers.firstValue("Mcp-Session-Id").orElseThrow()
      // an end-to-end tool call through the transport: same engine path
      // as McpSpec, different wire
      val csv = "wage,education,group\\n" + Seq(
        "30,10,A", "32,12,A", "34,14,A", "36,16,A",
        "10,10,B", "15,10,B", "20,10,B", "12,12,B").mkString("\\n")
      val call =
        s"""{"jsonrpc":"2.0","method":"tools/call","params":{
           |"name":"forensic_decomposition","arguments":{
           |"csv_content":"$csv","outcome_variable":"wage",
           |"group_variable":"group","reference_group":"A",
           |"predictors":["education"],"bootstrap_reps":0}},"id":7}"""
          .stripMargin.replaceAll("\n", "")
      val resp = post(port, call,
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> sid))
      assert(resp.statusCode == 200, resp.body)
      val parsed = JsonMethods.parse(resp.body)
      assert((parsed \ "error") == JNothing, resp.body)
      val text = ((parsed \ "result" \ "content")(0) \ "text").extract[String]
      assert((JsonMethods.parse(text) \ "total_gap") != JNothing)
    } finally normal.stop()
  }

  test("idle sessions expire after the TTL") {
    val s = new McpHttp.Server(spark, Key, port = 0, sseHoldMs = 300L,
      sseKeepAliveMs = 100L, sessionTtlMs = 150L).start()
    try {
      val port = s.boundPort
      val init = post(port, rpc("initialize"), Seq("x-api-key" -> Key))
      assert(init.statusCode == 200)
      val sid = init.headers.firstValue("Mcp-Session-Id").orElseThrow()
      assert(s.sessionCount == 1)
      Thread.sleep(300L)
      // the sweep runs on the next request; the expired id is rejected
      val stale = post(port, rpc("ping"),
        Seq("x-api-key" -> Key, "Mcp-Session-Id" -> sid))
      assert(stale.statusCode == 401, s"expired session still accepted")
      assert(s.sessionCount == 0, "expired session not swept")
    } finally s.stop()
  }
}
