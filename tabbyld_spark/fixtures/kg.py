"""Deterministic mini-DBpedia fixture — replaces the reference's live SPARQL
endpoint (https://dbpedia.org/sparql, /root/reference/components/
CanonicalTableAnnotator.php:49-54) with four local tables:

    kg_labels   (entity, surface_form)      candidate lookup
    kg_types    (entity, class)             rdf:type
    kg_subclass (child, parent, depth)      precomputed rdfs:subClassOf* closure
    kg_triples  (subj, pred, obj)           entity context / relationship rank

~500 entities, ~40 classes (4-level tree), plus planted cases: homonyms
(disambiguated only by heading/context features), a hot entity (skew test),
and class labels for heading annotation. Everything is seeded — same seed →
byte-identical tables.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pandas as pd

from tabbyld_spark.fixtures import words as W
from tabbyld_spark.functions.normalize import normalize_entry_py

DBO = "http://dbpedia.org/ontology/"
DBR = "http://dbpedia.org/resource/"

OWL_THING = "http://www.w3.org/2002/07/owl#Thing"

# class tree: child -> parent (all dbo localnames); 4 levels under Thing
CLASS_TREE: dict[str, str | None] = {
    "Location": None, "Person": None, "Organisation": None,
    "Work": None, "Event": None, "Species": None,
    "Settlement": "Location", "NaturalPlace": "Location",
    "ArchitecturalStructure": "Location", "Country": "Location",
    "Athlete": "Person", "Artist": "Person", "Scientist": "Person",
    "Politician": "Person",
    "Company": "Organisation", "EducationalInstitution": "Organisation",
    "SportsTeam": "Organisation",
    "MusicalWork": "Work", "WrittenWork": "Work", "Film": "Work",
    "SocietalEvent": "Event", "SportsEvent": "Event",
    "Animal": "Species", "Plant": "Species",
    "City": "Settlement", "Town": "Settlement", "Village": "Settlement",
    "River": "NaturalPlace", "Mountain": "NaturalPlace", "Lake": "NaturalPlace",
    "Building": "ArchitecturalStructure", "Bridge": "ArchitecturalStructure",
    "SoccerPlayer": "Athlete", "TennisPlayer": "Athlete",
    "Painter": "Artist", "MusicalArtist": "Artist",
    "Airline": "Company", "Bank": "Company",
    "University": "EducationalInstitution", "School": "EducationalInstitution",
    "Album": "MusicalWork", "Song": "MusicalWork",
    "Bird": "Animal", "Mammal": "Animal",
}

# NER label -> dbo class (CanonicalTableAnnotator.php:40-43)
NER_CLASS = {
    "LOCATION": DBO + "Location",
    "PERSON": DBO + "Person",
    "ORGANIZATION": DBO + "Organisation",
}
# NER label -> dbr literal instance (CanonicalTableAnnotator.php:44-48)
NER_INSTANCE = {
    "NUMBER": DBR + "Number",
    "MONEY": DBR + "Money",
    "PERCENT": DBR + "Percent",
    "DATE": DBR + "Date",
    "TIME": DBR + "Time",
}


def _ancestors(cls: str) -> list[str]:
    out = []
    cur: str | None = cls
    while cur is not None:
        out.append(cur)
        cur = CLASS_TREE.get(cur)
    return out  # [cls, parent, ..., top]


@dataclass
class KG:
    labels: pd.DataFrame
    types: pd.DataFrame
    subclass: pd.DataFrame
    triples: pd.DataFrame
    # generation helpers (entity URI -> display name, class localname -> names)
    names: dict[str, str] = field(default_factory=dict)
    by_class: dict[str, list[str]] = field(default_factory=dict)
    rel: dict[str, list[tuple[str, str]]] = field(default_factory=dict)

    def to_spark(self, spark):
        return {
            "kg_labels": spark.createDataFrame(self.labels),
            "kg_types": spark.createDataFrame(self.types),
            "kg_subclass": spark.createDataFrame(self.subclass),
            "kg_triples": spark.createDataFrame(self.triples),
        }


def _uri(name: str) -> str:
    return DBR + name.replace(" ", "_")


def build_kg(seed: int = 42) -> KG:
    rng = random.Random(seed)
    names: dict[str, str] = {}      # uri -> display name
    by_class: dict[str, list[str]] = {}  # class localname -> [uri]
    types_rows: list[tuple[str, str]] = []
    labels_rows: list[tuple[str, str]] = []

    def add_entity(name: str, cls: str, uri: str | None = None) -> str:
        u = uri or _uri(name)
        names[u] = name
        by_class.setdefault(cls, []).append(u)
        types_rows.append((u, DBO + cls))
        labels_rows.append((u, normalize_entry_py(name)))
        return u

    # --- places ---
    used = set()
    def gen_place() -> str:
        while True:
            n = (rng.choice(W.SYLLABLES_A) + rng.choice(W.SYLLABLES_B)).capitalize()
            if n not in used:
                used.add(n)
                return n

    cities = [add_entity(gen_place(), "City") for _ in range(60)]
    towns = [add_entity(gen_place(), "Town") for _ in range(20)]
    rivers = [add_entity(gen_place() + " River", "River") for _ in range(15)]
    mountains = [add_entity("Mount " + gen_place(), "Mountain") for _ in range(15)]
    countries = [add_entity(gen_place() + "ia", "Country") for _ in range(12)]

    # --- people ---
    person_names = set()
    def gen_person() -> str:
        while True:
            n = rng.choice(W.FIRST_NAMES) + " " + rng.choice(W.LAST_NAMES)
            if n not in person_names:
                person_names.add(n)
                return n

    soccer = [add_entity(gen_person(), "SoccerPlayer") for _ in range(30)]
    tennis = [add_entity(gen_person(), "TennisPlayer") for _ in range(20)]
    painters = [add_entity(gen_person(), "Painter") for _ in range(20)]
    musicians = [add_entity(gen_person(), "MusicalArtist") for _ in range(30)]
    scientists = [add_entity(gen_person(), "Scientist") for _ in range(25)]
    politicians = [add_entity(gen_person(), "Politician") for _ in range(15)]

    # --- organisations ---
    org_names = set()
    def gen_org(suffix_pool) -> str:
        while True:
            n = rng.choice(W.ORG_STEMS) + " " + rng.choice(suffix_pool)
            if n not in org_names:
                org_names.add(n)
                return n

    airlines = [add_entity(gen_org(["Air", "Airways", "Jet"]), "Airline") for _ in range(15)]
    banks = [add_entity(gen_org(["Bank", "Capital", "Trust"]), "Bank") for _ in range(15)]
    companies = [add_entity(gen_org(W.ORG_SUFFIX), "Company") for _ in range(25)]
    universities = []
    for _ in range(15):
        base = names[rng.choice(cities)]
        nm = "University of " + base
        if nm not in org_names:
            org_names.add(nm)
            universities.append(add_entity(nm, "University"))
    teams = [add_entity(gen_org(["United", "FC", "Rovers"]), "SportsTeam") for _ in range(15)]

    # --- works ---
    album_names = set()
    def gen_album() -> str:
        while True:
            n = rng.choice(W.ALBUM_WORDS) + " " + rng.choice(W.ALBUM_NOUNS)
            if n not in album_names:
                album_names.add(n)
                return n

    albums = [add_entity(gen_album(), "Album") for _ in range(40)]
    films = [add_entity(gen_album() + " Movie", "Film") for _ in range(20)]

    # --- species ---
    birds = [add_entity(gen_place() + " finch", "Bird") for _ in range(10)]
    mammals = [add_entity(gen_place() + " fox", "Mammal") for _ in range(10)]

    # --- homonyms: same surface form, one City + one Person entity ---
    homonyms = []
    for nm in W.HOMONYM_NAMES:
        c = add_entity(nm, "City", uri=_uri(nm + "_(city)"))
        p = add_entity(nm, "Scientist", uri=_uri(nm + "_(person)"))
        homonyms.append((nm, c, p))

    # --- class labels (heading annotation: dbo classes resolvable by name) ---
    for cls in CLASS_TREE:
        labels_rows.append((DBO + cls, normalize_entry_py(cls)))
        names[DBO + cls] = cls

    # --- subclass transitive closure incl. self (depth 0) + owl:Thing top ---
    sub_rows: list[tuple[str, str, int]] = []
    for cls in CLASS_TREE:
        anc = _ancestors(cls)
        for d, a in enumerate(anc):
            sub_rows.append((DBO + cls, DBO + a, d))
        sub_rows.append((DBO + cls, OWL_THING, len(anc)))
    sub_rows.append((OWL_THING, OWL_THING, 0))

    # --- triples (relations; also the entity-context source) ---
    trip: list[tuple[str, str, str]] = []
    rel: dict[str, list[tuple[str, str]]] = {}

    def relate(pred: str, pairs: list[tuple[str, str]]):
        rel[pred] = pairs
        for s, o in pairs:
            trip.append((s, DBO + pred, o))

    people = soccer + tennis + painters + musicians + scientists + politicians
    hot_city = cities[0]  # skew: most birthplaces point here
    relate("birthPlace", [
        (p, hot_city if rng.random() < 0.35 else rng.choice(cities)) for p in people
    ])
    relate("locationCity", [(c, rng.choice(cities)) for c in airlines + banks + companies + universities])
    relate("artist", [(a, rng.choice(musicians)) for a in albums])
    relate("team", [(p, rng.choice(teams)) for p in soccer])
    relate("country", [(c, rng.choice(countries)) for c in cities + towns])
    relate("sourceCountry", [(r, rng.choice(countries)) for r in rivers])
    # homonym-city context: each homonym city sits in a country (the homonym
    # person deliberately stays OUT of the page-generation pools — it exists
    # only as a KG distractor for disambiguation)
    for nm, c, p in homonyms:
        co = rng.choice(countries)
        trip.append((c, DBO + "country", co))
        rel["country"].append((c, co))
        trip.append((p, DBO + "birthPlace", rng.choice(cities)))
    # rdf:type edges live in kg_triples too (as in DBpedia) — the reference's
    # parent-class query (P15) takes any property's dbo:-prefixed object
    for u, cls_uri in types_rows:
        trip.append((u, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", cls_uri))
    # extra noise edges
    for _ in range(1500):
        s = rng.choice(list(names))
        o = rng.choice(list(names))
        trip.append((s, DBO + rng.choice(["related", "seeAlso", "knownFor"]), o))

    labels = pd.DataFrame(sorted(set(labels_rows)), columns=["entity", "surface_form"])
    types = pd.DataFrame(sorted(set(types_rows)), columns=["entity", "class"])
    subclass = pd.DataFrame(sorted(set(sub_rows)), columns=["child", "parent", "depth"])
    triples = pd.DataFrame(sorted(set(trip)), columns=["subj", "pred", "obj"])
    return KG(labels, types, subclass, triples, names=names, by_class=by_class, rel=rel)
