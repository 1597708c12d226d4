package graft.text

/** Public-suffix fixture — a curated OFFLINE SNAPSHOT of the Mozilla
  * Public Suffix List's shape (publicsuffix.org; reference semantics:
  * longest matching suffix wins, a host equal to a suffix has no
  * registrable domain). The sandbox has no egress, so this is not the
  * full ~10k-entry published file but a faithful subset assembled from
  * public knowledge: every current ccTLD, the major gTLDs, the
  * second-level registration suffixes of the large ccTLD registries,
  * and the widely-used PRIVATE-section entries. The resolution
  * machinery ([[Urls]]) is list-agnostic — swapping in the full
  * published file is a one-constant change, and the broadcast-join
  * plan shape is already sized for 10k+ entries (a few hundred KB on
  * every executor).
  */
object PublicSuffixes {

  /** ICANN section: top-level domains. */
  val TopLevel: Seq[String] = Seq(
    // original + sponsored gTLDs
    "com", "net", "org", "edu", "gov", "mil", "int", "arpa",
    "aero", "asia", "biz", "cat", "coop", "info", "jobs", "mobi",
    "museum", "name", "post", "pro", "tel", "travel", "xxx",
    // high-traffic new gTLDs
    "app", "dev", "io", "ai", "co", "me", "tv", "cc", "ws", "fm",
    "blog", "shop", "site", "online", "store", "tech", "xyz", "club",
    "cloud", "live", "news", "wiki", "space", "world", "agency",
    "digital", "studio", "design", "email", "solutions", "today",
    "network", "systems", "zone", "plus", "run", "page", "art",
    "media", "games", "chat", "codes", "tools", "works", "expert",
    "finance", "capital", "fund", "money", "market", "sale", "deals",
    // ccTLDs (ISO 3166)
    "ac", "ad", "ae", "af", "ag", "al", "am", "ao", "aq", "ar",
    "as", "at", "au", "aw", "ax", "az", "ba", "bb", "bd", "be",
    "bf", "bg", "bh", "bi", "bj", "bm", "bn", "bo", "br", "bs",
    "bt", "bw", "by", "bz", "ca", "cd", "cf", "cg", "ch", "ci",
    "ck", "cl", "cm", "cn", "cr", "cu", "cv", "cw", "cx", "cy",
    "cz", "de", "dj", "dk", "dm", "do", "dz", "ec", "ee", "eg",
    "er", "es", "et", "eu", "fi", "fj", "fk", "fo", "fr", "ga",
    "gd", "ge", "gf", "gg", "gh", "gi", "gl", "gm", "gn", "gp",
    "gq", "gr", "gs", "gt", "gu", "gw", "gy", "hk", "hm", "hn",
    "hr", "ht", "hu", "id", "ie", "il", "im", "in", "iq", "ir",
    "is", "it", "je", "jm", "jo", "jp", "ke", "kg", "kh", "ki",
    "km", "kn", "kp", "kr", "kw", "ky", "kz", "la", "lb", "lc",
    "li", "lk", "lr", "ls", "lt", "lu", "lv", "ly", "ma", "mc",
    "md", "mg", "mh", "mk", "ml", "mm", "mn", "mo", "mp", "mq",
    "mr", "ms", "mt", "mu", "mv", "mw", "mx", "my", "mz", "na",
    "nc", "ne", "nf", "ng", "ni", "nl", "no", "np", "nr", "nu",
    "nz", "om", "pa", "pe", "pf", "pg", "ph", "pk", "pl", "pm",
    "pn", "pr", "ps", "pt", "pw", "py", "qa", "re", "ro", "rs",
    "ru", "rw", "sa", "sb", "sc", "sd", "se", "sg", "sh", "si",
    "sk", "sl", "sm", "sn", "so", "sr", "ss", "st", "sv", "sx",
    "sy", "sz", "tc", "td", "tf", "tg", "th", "tj", "tk", "tl",
    "tm", "tn", "to", "tr", "tt", "tw", "tz", "ua", "ug", "uk",
    "us", "uy", "uz", "va", "vc", "ve", "vg", "vi", "vn", "vu",
    "wf", "ye", "yt", "za", "zm", "zw")

  /** ICANN section: second-level registration suffixes of the larger
    * registries (the entries a naive last-two-labels split gets wrong).
    */
  val SecondLevel: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk",
    "sch.uk", "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br", "eco.br", "emp.br", "eng.br",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn",
    "org.cn",
    // New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "kiwi.nz", "maori.nz", "mil.nz", "net.nz", "org.nz", "school.nz",
    // South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za",
    "net.za", "nom.za", "org.za", "school.za", "web.za",
    // South Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
    // Mexico / Argentina / Chile / Colombia / Peru / Venezuela
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "mil.ar", "tur.ar",
    "gob.cl", "gov.cl", "mil.cl",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co",
    "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
    "org.pe",
    "com.ve", "edu.ve", "gob.ve", "mil.ve", "net.ve", "org.ve",
    // Turkey / Israel / Russia / Ukraine / Poland
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr",
    "edu.tr", "gen.tr", "gov.tr", "info.tr", "k12.tr", "mil.tr",
    "name.tr", "net.tr", "org.tr", "pol.tr", "tel.tr", "web.tr",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
    "net.il", "org.il",
    "com.ru", "net.ru", "org.ru", "edu.ru", "gov.ru", "int.ru",
    "mil.ru", "msk.ru", "spb.ru",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "kiev.ua", "kyiv.ua", "lviv.ua", "odessa.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl",
    // Taiwan / Thailand / Indonesia / Malaysia / Singapore / HK
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id",
    "my.id", "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    // Egypt / Saudi Arabia / UAE / Nigeria / Kenya / Ghana
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae",
    "sch.ae",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke",
    "ne.ke", "or.ke", "sc.ke",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    // Europe odds and ends with registry second levels
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "co.hu", "info.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    // US states shape (PSL carries all; representative subset)
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "cc.ca.us", "lib.ca.us",
    "state.ca.us", "state.ny.us", "state.tx.us",
    // Canada provinces
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca")

  /** PRIVATE section: operator-registered suffixes under which third
    * parties register names (the entries that matter for crawl dedup —
    * two github.io sites are different registrants).
    */
  val PrivateSection: Seq[String] = Seq(
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "wordpress.com", "tumblr.com", "medium.com",
    "herokuapp.com", "appspot.com", "web.app", "firebaseapp.com",
    "netlify.app", "vercel.app", "pages.dev", "workers.dev",
    "surge.sh", "onrender.com", "fly.dev", "glitch.me", "repl.co",
    "s3.amazonaws.com", "s3-us-west-2.amazonaws.com",
    "s3.eu-west-1.amazonaws.com", "elb.amazonaws.com",
    "cloudfront.net", "azurewebsites.net", "cloudapp.azure.com",
    "blob.core.windows.net", "googleapis.com", "run.app",
    "cdn.cloudflare.net", "fastly.net", "akamaized.net",
    "readthedocs.io", "gitbook.io", "notion.site", "webflow.io",
    "myshopify.com", "squarespace.com", "wixsite.com", "weebly.com",
    "bandcamp.com", "itch.io", "neocities.org", "keybase.pub",
    "duckdns.org", "no-ip.org", "dyndns.org", "ngrok.io",
    "linodeusercontent.com", "digitaloceanspaces.com",
    "oraclecloud.com", "pythonanywhere.com", "streamlit.app",
    "hf.space", "eu.org")

  /** The full fixture, deduplicated, resolution-ready. */
  val All: Seq[String] = (TopLevel ++ SecondLevel ++ PrivateSection).distinct
}
