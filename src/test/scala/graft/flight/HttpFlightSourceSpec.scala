package graft.flight

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.flight.FlightModel.Zone
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Drives [[HttpFlightSource]] + [[FlightExtract]] against an
  * in-process fake of the upstream API: nested zones document, a
  * bounds-filtered feed that truncates at its page limit (so the
  * quadtree splitter must recurse OVER HTTP), and the airline/airport
  * dictionaries. No network leaves the process.
  */
class HttpFlightSourceSpec extends AnyFunSuite {

  private val Limit = 2

  // (id, lat, lon): 5 in the northern leaf zone — 3 of them in its NW
  // quadrant (forces a second subdivision level, where one more split
  // separates them) — 1 southern. All well clear of quadrant
  // boundaries so no flight is double-counted at an edge.
  private val world = Seq(
    ("f1", 80.0, -170.0), ("f2", 50.0, -100.0), ("f3", 80.0, -10.0),
    ("f4", 30.0, -150.0),
    ("f5", 30.0, 100.0),
    ("f6", -40.0, 20.0))

  private def feedJson(tlY: Double, brY: Double, tlX: Double, brX: Double): String = {
    val inside = world.filter { case (_, la, lo) =>
      la <= tlY && la >= brY && lo >= tlX && lo <= brX }
    val page = inside.take(Limit) // server-side truncation at the page limit
    val entries = page.map { case (id, la, lo) =>
      s""""$id":["icao$id",$la,$lo,0,35000,450,"1200","rad","A320","reg",1700000000,"CDG","JFK","AF00$id",0,0,"AF00$id","AFR"]"""
    }
    s"""{"full_count":${world.size},"version":4${if (entries.isEmpty) "" else entries.mkString(",", ",", "")}}"""
  }

  private def zonesJson: String =
    """{"version":4,
      |"world":{"tl_y":90,"tl_x":-180,"br_y":-90,"br_x":180,
      |  "subzones":{
      |    "north":{"tl_y":90,"tl_x":-180,"br_y":0,"br_x":180},
      |    "south":{"tl_y":0,"tl_x":-180,"br_y":-90,"br_x":180}}}}""".stripMargin

  private def withServer(test: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val feedCalls = new AtomicInteger(0)
    def reply(ex: HttpExchange, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    }
    server.createContext("/js/zones.js", (ex: HttpExchange) => reply(ex, zonesJson))
    server.createContext("/zones/fcgi/feed.js", (ex: HttpExchange) => {
      feedCalls.incrementAndGet()
      val bounds = ex.getRequestURI.getRawQuery.stripPrefix("bounds=").split(",").map(_.toDouble)
      reply(ex, feedJson(bounds(0), bounds(1), bounds(2), bounds(3)))
    })
    server.createContext("/_json/airlines.php", (ex: HttpExchange) =>
      reply(ex, """{"version":1,"rows":[{"Name":"Air France","Code":"AF","ICAO":"AFR"},{"Name":"Lufthansa","ICAO":"DLH"}]}"""))
    server.createContext("/_json/airports.php", (ex: HttpExchange) =>
      reply(ex, """{"version":1,"rows":[{"name":"Charles de Gaulle","iata":"CDG","lat":49.0097,"lon":2.5479,"country":"France"},{"name":"JFK","iata":"JFK","lat":40.6413,"lon":-73.7781,"country":"United States"}]}"""))
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", feedCalls)
    finally server.stop(0)
  }

  test("zones document flattens to leaf zones (subzones descended, metadata skipped)") {
    withServer { (url, _) =>
      val zs = new HttpFlightSource(url).zones
      assert(zs == Seq(
        Zone(90, -180, 0, 180),   // north leaf
        Zone(0, -180, -90, 180))) // south leaf
    }
  }

  test("feed page parses the positional flight arrays and skips metadata keys") {
    withServer { (url, _) =>
      val fs = new HttpFlightSource(url)
        .flightsInZone(Zone(0, -180, -90, 180), Limit) // southern leaf: f6 only
      assert(fs.map(_.id) == Seq("f6"))
      val f = fs.head
      assert(f.latitude.contains(-40.0f) && f.longitude.contains(20.0f))
      assert(f.aircraft_code == "A320" && f.origin_airport_iata == "CDG" &&
        f.destination_airport_iata == "JFK" && f.number == "AF00f6" &&
        f.on_ground.contains(0) && f.airline_icao == "AFR" &&
        f.time.contains(1700000000))
    }
  }

  test("truncation sentinel drives quadtree recursion over HTTP until every flight is recovered") {
    withServer { (url, feedCalls) =>
      val src = new HttpFlightSource(url)
      val all = FlightExtract.allFlights(src, limit = Limit)
      // full recall despite every truncated page being discarded
      assert(all.map(_.id).sorted == Seq("f1", "f2", "f3", "f4", "f5", "f6"))
      assert(all.map(_.id).distinct.size == all.size, "boundary double-count")
      // north leaf truncates (5 flights > page of 2) and so does its NW
      // quadrant (3 flights): exactly two subdivision levels →
      // 1 (north) + 4 (quads) + 4 (NW subquads) + 1 (south) requests.
      assert(feedCalls.get() == 10, s"expected 10 recursive fetches, saw ${feedCalls.get()}")
    }
  }

  test("airline/airport dictionaries parse the rows envelope") {
    withServer { (url, _) =>
      val src = new HttpFlightSource(url)
      assert(src.airlines.map(_.ICAO) == Seq("AFR", "DLH"))
      val cdg = src.airports.head
      assert(cdg.iata == "CDG" && cdg.latitude.contains(49.0097f) &&
        cdg.country == "France")
    }
  }
}
