package graft.flight

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.flight.FlightModel.{Airline, Airport, Flight, Zone}

import java.net.{HttpURLConnection, URI}
import scala.jdk.CollectionConverters._

/** Live-API [[FlightSource]]: HTTP implementation of the extraction
  * seam the reference drives through the `FlightRadarAPI` client
  * (reference `/root/reference/src/extract.py:54-83`,
  * `requirements/base.txt:5`). Endpoint paths and wire shapes follow
  * that client's public contract:
  *
  *   - zones: a JSON object of named bounding boxes, possibly nested
  *     under `"subzones"`; extraction descends to LEAF zones, exactly
  *     as `get_flights` recurses before fetching (`extract.py:57-59`).
  *   - feed: `?bounds=tl_y,br_y,tl_x,br_x` returns an object whose
  *     array-valued entries are flights keyed by id, positional
  *     fields: [icao, lat, lon, track, alt, speed, squawk, radar,
  *     aircraft_code, registration, time, origin_iata, dest_iata,
  *     number, on_ground, vspeed, callsign, airline_icao]. Metadata
  *     keys (`full_count`, `version`, ...) are non-arrays and skipped.
  *   - airlines/airports: `{"rows": [...]}` dictionaries.
  *
  * The server truncates each feed response at its page limit; the
  * quadtree splitter ([[FlightExtract.flightsForZone]]) detects
  * `size == limit` and subdivides — this class only fetches. No
  * retries/backoff here by design: wrap `fetch` when a deployment
  * needs a policy. Tested against an in-process fake server
  * (HttpFlightSourceSpec) — the sandbox has no egress.
  */
final class HttpFlightSource(
    baseUrl: String,
    zonesPath: String = "/js/zones.js",
    feedPath: String = "/zones/fcgi/feed.js",
    airlinesPath: String = "/_json/airlines.php",
    airportsPath: String = "/_json/airports.php",
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 15000) extends FlightSource {

  private val mapper = new ObjectMapper()

  private def fetch(pathAndQuery: String): JsonNode = {
    val conn = new URI(baseUrl + pathAndQuery).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestProperty("Accept", "application/json")
    try {
      val code = conn.getResponseCode
      if (code != 200) throw new java.io.IOException(s"GET $pathAndQuery -> HTTP $code")
      val in = conn.getInputStream
      try mapper.readTree(in) finally in.close()
    } finally conn.disconnect()
  }

  private def optText(n: JsonNode, i: Int): String =
    if (n.has(i) && !n.get(i).isNull) n.get(i).asText() else ""

  /** Leaf zones of the (possibly nested) zones document. */
  override def zones: Seq[Zone] = {
    def leaves(node: JsonNode): Seq[Zone] =
      node.properties().asScala.toSeq.flatMap { e =>
        val v = e.getValue
        if (!v.isObject) Nil // "version" etc.
        else if (v.has("subzones")) leaves(v.get("subzones"))
        else if (v.has("tl_y") && v.has("tl_x") && v.has("br_y") && v.has("br_x"))
          Seq(Zone(v.get("tl_y").asDouble(), v.get("tl_x").asDouble(),
            v.get("br_y").asDouble(), v.get("br_x").asDouble()))
        else Nil
      }
    leaves(fetch(zonesPath))
  }

  /** One feed page for a bounding box. The `limit` is the server's
    * page size — the caller's truncation sentinel — not a client cap.
    */
  override def flightsInZone(zone: Zone, limit: Int): Seq[Flight] = {
    val bounds = s"${zone.tlY},${zone.brY},${zone.tlX},${zone.brX}"
    val root = fetch(s"$feedPath?bounds=$bounds")
    root.properties().asScala.toSeq.collect {
      case e if e.getValue.isArray =>
        val a = e.getValue
        Flight(
          id = e.getKey,
          aircraft_code = optText(a, 8),
          time = if (a.has(10) && a.get(10).canConvertToInt) Some(a.get(10).asInt()) else None,
          latitude = if (a.has(1) && a.get(1).isNumber) Some(a.get(1).floatValue()) else None,
          longitude = if (a.has(2) && a.get(2).isNumber) Some(a.get(2).floatValue()) else None,
          origin_airport_iata = optText(a, 11),
          destination_airport_iata = optText(a, 12),
          number = optText(a, 13),
          on_ground = if (a.has(14) && a.get(14).canConvertToInt) Some(a.get(14).asInt()) else None,
          airline_icao = optText(a, 17))
    }
  }

  override def airlines: Seq[Airline] =
    fetch(airlinesPath).path("rows").elements().asScala.toSeq.map { r =>
      Airline(r.path("Name").asText(""), r.path("ICAO").asText(""))
    }

  override def airports: Seq[Airport] =
    fetch(airportsPath).path("rows").elements().asScala.toSeq.map { r =>
      Airport(
        name = r.path("name").asText(""),
        iata = r.path("iata").asText(""),
        latitude = if (r.hasNonNull("lat")) Some(r.get("lat").floatValue()) else None,
        longitude = if (r.hasNonNull("lon")) Some(r.get("lon").floatValue()) else None,
        country = r.path("country").asText(""))
    }
}
