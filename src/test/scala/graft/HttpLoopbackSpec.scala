package graft

import graft.sources.PaginatedHttpSource
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** E14/S1/F7 executed over REAL HTTP: a JDK HttpServer bound to
  * 127.0.0.1 (loopback — no egress) serves the paginated listing
  * fixture, and the source's page loop drives it through an actual
  * `HttpURLConnection` fetcher from executor threads. This closes the
  * gap PaginationSpec's injected transport leaves open: the URL the
  * template builds is the URL a socket actually GETs, server-side
  * predicate pushdown arrives as query parameters, pagination stop is
  * observed as request counts on the server, and the fetch-error
  * break is a real 500 status. */
object LoopbackFixture {
  val requests = new AtomicInteger(0)
  @volatile var lastQuery: String = ""

  private def block(mls: String) =
    s"""<table class="public-detail-quickview"><span class="mls">$mls</span>
       |<span class="price">$$100,000</span></table>""".stripMargin

  /** Real-socket fetcher: 200 → page body, anything else → None (the
    * RequestException break path). Captures nothing — serializable for
    * the executor-side flatMap. */
  val httpFetch: String => Option[String] = url => {
    val conn = URI.create(url).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    try {
      if (conn.getResponseCode != 200) None
      else Some(new String(conn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8))
    } finally conn.disconnect()
  }

  def start(): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/search", exchange => {
      requests.incrementAndGet()
      val q = exchange.getRequestURI.getQuery
      lastQuery = q
      def param(key: String): String =
        q.split(s"$key=")(1).split("&")(0)
      val (zip, page) = (param("zip"), param("page").toInt)
      val (status, body) =
        if (zip == "99999") (500, "boom")
        else if (page <= 2) (200, block(s"$zip-P$page"))
        else if (page == 3) (200, "<html>no listings</html>")
        else (200, { throw new IllegalStateException(
          s"F7 violated over real HTTP: fetched page $page") })
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(status, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    server
  }
}

class HttpLoopbackSpec extends SparkSpec {

  test("paginated scan end-to-end over a loopback socket") {
    val server = LoopbackFixture.start()
    try {
      val port = server.getAddress.getPort
      val template =
        s"http://127.0.0.1:$port/search?zip=%s&maxPrice=%d&minSqFt=%d&minLot=%s&page=%d"
      LoopbackFixture.requests.set(0)
      val src = new PaginatedHttpSource(template, 15000000L, 750L, 0.01,
        LoopbackFixture.httpFetch)
      val got = src.scan(spark, Seq("84601", "84058"))
        .collect().map(_.mls).sorted.toSeq
      assert(got == Seq("84058-P1", "84058-P2", "84601-P1", "84601-P2"))
      // F7 on the wire: 3 requests per zip (2 listing pages + empty)
      assert(LoopbackFixture.requests.get() == 6)
      // F1/E14 on the wire: the server received the pushed predicates
      assert(LoopbackFixture.lastQuery.contains("maxPrice=15000000"))
      assert(LoopbackFixture.lastQuery.contains("minSqFt=750"))
      // fetch error = real 500 → loop breaks, empty result
      assert(src.scan(spark, Seq("99999")).isEmpty)
    } finally server.stop(0)
  }
}
