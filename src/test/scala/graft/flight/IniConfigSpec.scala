package graft.flight

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** E7 parity: a template-shaped `config.ini` round-trips into the
  * engine's pipeline/session arguments (reference
  * `util/config_handler.py`, `config/config.ini.template`).
  */
class IniConfigSpec extends AnyFunSuite {

  // Shape-identical to /root/reference/src/config/config.ini.template
  private val template =
    """[path]
      |airlines_csv_path = airlines.csv
      |airports_csv_path = airports.csv
      |flights_parquet_path = Flights
      |
      |[MINIO]
      |MINIO_ENDPOINT = localstore:9000
      |MINIO_ACCESS = testkey
      |MINIO_SECRET = testsecret
      |MINIO_BUCKET = flightdata
      |
      |[SPARK]
      |SPARK_MASTER_URL = spark://master:7070
      |
      |[API]
      |API_LIMIT = 1500
      |""".stripMargin

  test("configparser semantics: case-insensitive keys, missing -> None, comments skipped") {
    val ini = IniConfig.parse("# top comment\n[API]\n; note\nAPI_LIMIT = 1500\n")
    assert(ini.get("API", "api_limit").contains("1500"))
    assert(ini.get("API", "API_LIMIT").contains("1500"))
    assert(ini.get("API", "missing").isEmpty)
    assert(ini.get("NoSection", "API_LIMIT").isEmpty)
  }

  test("set + save + load round-trips") {
    val ini = IniConfig.parse(template)
    ini.set("API", "API_LIMIT", "700")
    val f = Files.createTempFile("graft-ini", ".ini")
    try {
      ini.save(f)
      val back = FlightConfig.fromIni(f)
      assert(back.apiLimit == 700)
      assert(back.bucket.contains("flightdata"))
    } finally Files.delete(f)
  }

  test("template maps onto pipeline/session arguments") {
    val cfg = FlightConfig.fromIni(IniConfig.parse(template))
    assert(cfg.airlinesCsvPath == "airlines.csv")
    assert(cfg.airportsCsvPath == "airports.csv")
    assert(cfg.flightsParquetPath == "Flights")
    assert(cfg.basePath == "s3a://flightdata")
    assert(cfg.sparkMasterUrl.contains("spark://master:7070"))
    assert(cfg.apiLimit == 1500)
    val s3 = cfg.s3Profile.get
    assert(s3.endpoint == "localstore:9000" && s3.accessKey == "testkey" &&
      s3.secretKey == "testsecret" && s3.pathStyle && !s3.ssl)
    // the s3a conf block the cluster session would receive
    val conf = graft.GraftSession.s3aConf(s3)
    assert(conf("spark.hadoop.fs.s3a.endpoint") == "localstore:9000")
    assert(conf("spark.hadoop.fs.s3a.committer.name") == "magic")
  }

  test("empty MINIO credentials (the template default) -> no S3 profile, local base path") {
    val cfg = FlightConfig.fromIni(IniConfig.parse(
      "[MINIO]\nMINIO_ENDPOINT =\nMINIO_BUCKET =\n[API]\nAPI_LIMIT = oops\n"))
    assert(cfg.s3Profile.isEmpty)
    assert(cfg.basePath == ".")
    // unparseable limit falls back to the engine default (the reference
    // would have compared against the raw string — extract.py:63)
    assert(cfg.apiLimit == FlightExtract.DefaultApiLimit)
  }

  test("a config-driven pipeline run works end-to-end with a fixture source") {
    val spark = graft.TestSpark.spark
    val ini = IniConfig.parse(template)
    ini.set("MINIO", "MINIO_ENDPOINT", "") // local run: no object store
    ini.set("MINIO", "MINIO_BUCKET", "")
    val cfg = FlightConfig.fromIni(ini)
    val dir = Files.createTempDirectory("graft-ini-pipe").toString
    val src = new FlightSource {
      import graft.flight.FlightModel._
      override def zones = Seq(Zone(90, -180, -90, 180))
      override def flightsInZone(z: Zone, limit: Int) = Seq(
        Flight("ff1", "A320", Some(1700000000), Some(48.0f), Some(2.0f),
          "CDG", "JFK", "AF1", Some(0), "AFR"))
      override def airlines = Seq(Airline("Air France", "AFR"))
      override def airports = Seq(
        Airport("Charles de Gaulle", "CDG", Some(49.01f), Some(2.55f), "France"),
        Airport("JFK", "JFK", Some(40.64f), Some(-73.78f), "United States"))
    }
    val gold = new FlightPipeline(spark, src, s"$dir/${cfg.flightsParquetPath}",
      apiLimit = cfg.apiLimit).run()
    assert(spark.read.parquet(gold).count() == 1)
  }
}
