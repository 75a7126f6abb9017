"""Deterministic word pools for fixture generation. No external data."""

SYLLABLES_A = [
    "mar", "bel", "dor", "fen", "gal", "har", "kel", "lun", "nor", "pol",
    "ras", "sel", "tor", "ver", "wil", "zan", "ost", "riv", "cal", "bru",
]
SYLLABLES_B = [
    "ia", "on", "ville", "burg", "ford", "mouth", "stad", "grad", "field",
    "ton", "by", "wick", "holm", "minster", "port", "haven", "dale", "mere",
]
FIRST_NAMES = [
    "Alan", "Bela", "Carl", "Dina", "Egon", "Fera", "Gus", "Hana", "Ivo",
    "Jana", "Kai", "Lena", "Milo", "Nora", "Otto", "Pia", "Quin", "Rosa",
    "Sven", "Tara", "Ugo", "Vera", "Wim", "Xena", "Yan", "Zora",
]
LAST_NAMES = [
    "Becker", "Castel", "Dorman", "Ekman", "Falk", "Gruber", "Holst",
    "Ibsen", "Jansen", "Krog", "Lindt", "Maron", "Nold", "Orsted", "Prey",
    "Quist", "Rahn", "Selig", "Thorn", "Unger", "Voss", "Wern", "Yost", "Zeil",
]
ORG_STEMS = [
    "Acme", "Borea", "Cresta", "Dynax", "Elvio", "Fornax", "Gigan", "Helix",
    "Ionis", "Jovia", "Krone", "Lumen", "Metrix", "Novus", "Orbis", "Pyra",
    "Quanta", "Rubix", "Solis", "Tegra", "Ultra", "Vanta", "Wexel", "Xenon",
]
ORG_SUFFIX = ["Corp", "Labs", "Group", "Systems", "Air", "Bank", "Works"]
ALBUM_WORDS = [
    "Silver", "Golden", "Broken", "Silent", "Electric", "Velvet", "Hollow",
    "Distant", "Frozen", "Burning", "Paper", "Glass", "Neon", "Wild",
]
ALBUM_NOUNS = [
    "River", "Sky", "Mirror", "Road", "Garden", "Echo", "Season", "Harbor",
    "Signal", "Window", "Motor", "Letter", "Tide", "Ember",
]
PARA_WORDS = (
    "the quick data web page table crawl index spark shuffle join scan "
    "filter merge sort query plan batch stream column row value key hash "
    "graph node edge triple entity class label text token parse link rank"
).split()
HOMONYM_NAMES = ["Mercury", "Phoenix", "Aurora", "Atlas", "Orion", "Vega"]
