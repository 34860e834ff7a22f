"""Pluggable lemmatizer seam + a small pure-Python English lemmatizer.

The reference lemmatizes every token with spaCy (extract_words.py:207-211,
283-291), which is model-version-dependent and not installable in this
environment. The engine therefore exposes a *seam*: any ``str -> str``
callable over lowercase alpha words can be plugged into the tokenizer
(``textparse.tokenize_lines`` / ``textparse_vec.tokenize_batch`` /
``operators.extract.tokenize*``). On a cluster image that ships spaCy, wrap
``lambda w: nlp(w)[0].lemma_`` (memoized) and pass it through the same seam.

``english_lemma`` is the built-in deterministic option: an irregular-form
table (common verbs/nouns) plus conservative inflection rules for plural
``-s/-es/-ies``, past ``-ed`` and progressive ``-ing`` — Porter-style
double-consonant and cvc handling so ``stopped→stop`` but ``hoped→hope``,
with a noun exception list so ``thing``/``during`` survive. It narrows the
surface-form gap (go/went/goes collapse) without any dependency; it is NOT
spaCy and is off by default so default-mode results stay those of the frozen
fixtures.

Applied per normalized PART (after alphabet-normalization/compound split),
once per unique token in the vectorized path (Zipf: vocabulary ≪ tokens).
"""

from __future__ import annotations

from collections.abc import Callable

Lemmatizer = Callable[[str], str]

# Irregular inflections → lemma (public common knowledge; intersection of any
# standard English irregular-verb/noun table).
IRREGULAR: dict[str, str] = {
    # be / have / do / modals-adjacent
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do",
    # high-frequency irregular verbs (past / participle → base)
    "went": "go", "gone": "go", "goes": "go",
    "said": "say", "made": "make", "took": "take", "taken": "take",
    "came": "come", "saw": "see", "seen": "see", "knew": "know",
    "known": "know", "got": "get", "gotten": "get", "gave": "give",
    "given": "give", "found": "find", "thought": "think", "told": "tell",
    "became": "become", "left": "leave", "felt": "feel", "brought": "bring",
    "began": "begin", "begun": "begin", "kept": "keep", "held": "hold",
    "wrote": "write", "written": "write", "stood": "stand", "heard": "hear",
    "meant": "mean", "met": "meet", "ran": "run", "paid": "pay",
    "sat": "sit", "spoke": "speak", "spoken": "speak", "led": "lead",
    "grew": "grow", "grown": "grow", "lost": "lose", "fell": "fall",
    "fallen": "fall", "sent": "send", "built": "build", "drew": "draw",
    "drawn": "draw", "broke": "break", "broken": "break", "spent": "spend",
    "rose": "rise", "risen": "rise", "drove": "drive", "driven": "drive",
    "bought": "buy", "wore": "wear", "worn": "wear", "chose": "choose",
    "chosen": "choose", "ate": "eat", "eaten": "eat", "flew": "fly",
    "flown": "fly", "threw": "throw", "thrown": "throw", "caught": "catch",
    "slept": "sleep", "won": "win", "sang": "sing", "sung": "sing",
    "drank": "drink", "drunk": "drink", "swam": "swim", "swum": "swim",
    "forgot": "forget", "forgotten": "forget", "understood": "understand",
    "woke": "wake", "woken": "wake", "shook": "shake", "shaken": "shake",
    "stole": "steal", "stolen": "steal",
    "struck": "strike", "sworn": "swear", "swore": "swear",
    "taught": "teach", "tore": "tear", "torn": "tear",
    "dying": "die", "lying": "lie", "tying": "tie",
    # second batch of irregular verbs (r3 breadth extension; forms whose
    # surface is UNAMBIGUOUSLY an inflection are included — homographs of
    # base verbs/nouns like "lay", "bore", "wound", "rose" stay out unless
    # already frozen into fixtures)
    "bent": "bend", "bit": "bite", "bitten": "bite", "bled": "bleed",
    "blew": "blow", "blown": "blow", "bound": "bind", "bred": "breed",
    "burnt": "burn", "crept": "creep", "dealt": "deal", "dug": "dig",
    "fed": "feed", "fled": "flee", "flung": "fling",
    "forbade": "forbid", "forbidden": "forbid",
    "forgave": "forgive", "forgiven": "forgive",
    "fought": "fight", "froze": "freeze", "frozen": "freeze",
    "hid": "hide", "hidden": "hide", "hung": "hang",
    "knelt": "kneel", "laid": "lay", "lain": "lie", "lent": "lend",
    "lit": "light", "rode": "ride", "ridden": "ride",
    "rang": "ring", "rung": "ring", "sank": "sink", "sunk": "sink",
    "shone": "shine", "shot": "shoot", "shown": "show",
    "shrank": "shrink", "shrunk": "shrink", "slid": "slide",
    "sold": "sell", "sought": "seek", "sped": "speed", "spelt": "spell",
    "sprang": "spring", "stuck": "stick", "stung": "sting",
    "stank": "stink", "strove": "strive", "swept": "sweep",
    "swung": "swing", "wept": "weep", "wrung": "wring",
    # adjective gradation (the reference's spaCy path collapses these;
    # context-free choices documented: better/best → good)
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "further": "far", "furthest": "far", "farther": "far",
    "farthest": "far", "elder": "old", "eldest": "old",
    # irregular noun plurals (second batch)
    "oxen": "ox", "criteria": "criterion", "phenomena": "phenomenon",
    "analyses": "analysis", "crises": "crisis", "theses": "thesis",
    "hypotheses": "hypothesis", "indices": "index", "matrices": "matrix",
    "appendices": "appendix", "calves": "calf", "loaves": "loaf",
    "thieves": "thief", "scarves": "scarf", "elves": "elf",
    # irregular noun plurals
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "wives": "wife",
    "knives": "knife", "lives": "life", "wolves": "wolf", "selves": "self",
    "leaves": "leaf", "halves": "half", "shelves": "shelf",
    # -oes / -ies plurals the rules can't see through
    "shoes": "shoe", "toes": "toe", "movies": "movie",
    # third batch (r4 breadth): compound-prefix irregulars + remaining
    # unambiguous simple forms; homographs of other base words (bore, wound,
    # lay-as-noun, smelt, dice, media, data) stay excluded as before
    "arose": "arise", "arisen": "arise", "beaten": "beat",
    "clung": "cling", "dreamt": "dream", "dwelt": "dwell",
    "foresaw": "foresee", "foreseen": "foresee", "leapt": "leap",
    "mistook": "mistake", "mistaken": "mistake",
    "overcame": "overcome", "overtook": "overtake", "overtaken": "overtake",
    "rebuilt": "rebuild", "repaid": "repay", "retold": "retell",
    "rewrote": "rewrite", "rewritten": "rewrite",
    "slew": "slay", "slain": "slay", "sprung": "spring",
    "strode": "stride", "striven": "strive", "swollen": "swell",
    "trod": "tread", "trodden": "tread",
    "undergone": "undergo", "underwent": "undergo",
    "undertook": "undertake", "undertaken": "undertake",
    "upheld": "uphold", "withdrew": "withdraw", "withdrawn": "withdraw",
    "withheld": "withhold", "withstood": "withstand",
    # Latin/Greek plurals (unambiguous)
    "cacti": "cactus", "fungi": "fungus", "nuclei": "nucleus",
    "radii": "radius", "stimuli": "stimulus", "alumni": "alumnus",
    "bacteria": "bacterium", "curricula": "curriculum",
}

# words that END in an inflection-shaped suffix but are not inflected —
# protect them from the rules below
_NOT_INFLECTED = frozenset(
    """
    thing things king kings ring rings spring string wing wings song
    during morning evening ceiling darling nothing something anything
    everything anywhere bring sing
    this his its is was has gas bus plus yes less unless boss class glass
    grass cross process press dress address business witness
    red bed wed led ted hundred sacred wicked naked wretched beloved
    ahead dead instead indeed need speed seed feed deed
    always perhaps news series species
    """.split()
)

_VOWELS = set("aeiou")


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s) or "y" in s[1:]


def _fix_stem(stem: str) -> str:
    """Porter-style repair after stripping -ed/-ing: undo consonant doubling
    (stopp→stop) except ll/ss/zz, or restore the silent e on short cvc stems
    (hop→hope — only when the strip CREATED the cvc shape)."""
    if (
        len(stem) >= 3
        and stem[-1] == stem[-2]
        and stem[-1] not in "lszaeiou"
    ):
        return stem[:-1]
    if (
        len(stem) >= 3
        and stem[-1] not in "aeiouwxy"
        and stem[-2] in _VOWELS
        and stem[-3] not in _VOWELS
    ):
        return stem + "e"
    return stem


def english_lemma(word: str) -> str:
    """Deterministic English lemma of a lowercase alpha word."""
    if word in IRREGULAR:
        return IRREGULAR[word]
    if word in _NOT_INFLECTED or len(word) < 4:
        return word

    # plural / 3rd-person -s
    if word.endswith("ies") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith(("ches", "shes", "xes", "zes", "sses", "oes")):
        return word[:-2]
    if word.endswith("s") and not word.endswith(("ss", "us", "is")):
        return word[:-1]

    # past -ed
    if word.endswith("ied") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("eed"):
        return word[:-1]  # agreed → agree, freed → free
    if word.endswith("ed") and len(word) > 4:
        stem = word[:-2]
        if _has_vowel(stem):
            return _fix_stem(stem)
        return word

    # progressive -ing
    if word.endswith("ing") and len(word) >= 5:
        stem = word[:-3]
        if _has_vowel(stem):
            return _fix_stem(stem)
        return word

    return word


# ---------------------------------------------------------------------------
# German (second language behind the seam — the reference corpus is largely
# German subtitles, /root/reference/test/test_detect_languages.py). Same
# design philosophy as english_lemma: an irregular table of unambiguous
# high-frequency forms + only MORPHOLOGICALLY SAFE suffix rules (German
# inflection is ambiguous enough that aggressive stemming would merge
# distinct lemmas, which is worse for retrieval than leaving forms apart).
# ---------------------------------------------------------------------------

IRREGULAR_DE: dict[str, str] = {
    # sein / haben / werden
    "bin": "sein", "bist": "sein", "ist": "sein", "sind": "sein",
    "seid": "sein", "war": "sein", "warst": "sein", "waren": "sein",
    "wart": "sein", "gewesen": "sein", "wäre": "sein", "wären": "sein",
    "habe": "haben", "hast": "haben", "hat": "haben", "habt": "haben",
    "hatte": "haben", "hattest": "haben", "hatten": "haben",
    "hattet": "haben", "gehabt": "haben", "hätte": "haben",
    "hätten": "haben",
    "werde": "werden", "wirst": "werden", "wird": "werden",
    "werdet": "werden", "wurde": "werden", "wurdest": "werden",
    "wurden": "werden", "wurdet": "werden", "geworden": "werden",
    "worden": "werden", "würde": "werden", "würden": "werden",
    # high-frequency strong verbs (preterite / participle → infinitive)
    "ging": "gehen", "gingen": "gehen", "gegangen": "gehen",
    "kam": "kommen", "kamen": "kommen", "gekommen": "kommen",
    "sah": "sehen", "sahen": "sehen", "gesehen": "sehen",
    "gab": "geben", "gaben": "geben", "gegeben": "geben",
    "nahm": "nehmen", "nahmen": "nehmen", "genommen": "nehmen",
    "fand": "finden", "fanden": "finden", "gefunden": "finden",
    "stand": "stehen", "standen": "stehen", "gestanden": "stehen",
    "sprach": "sprechen", "sprachen": "sprechen",
    "gesprochen": "sprechen",
    "sagte": "sagen", "sagten": "sagen", "gesagt": "sagen",
    "machte": "machen", "machten": "machen", "gemacht": "machen",
    "wusste": "wissen", "wussten": "wissen", "gewusst": "wissen",
    "weiß": "wissen", "weißt": "wissen",
    "dachte": "denken", "dachten": "denken", "gedacht": "denken",
    "brachte": "bringen", "brachten": "bringen", "gebracht": "bringen",
    "hielt": "halten", "hielten": "halten", "gehalten": "halten",
    "ließ": "lassen", "ließen": "lassen", "gelassen": "lassen",
    "lief": "laufen", "liefen": "laufen", "gelaufen": "laufen",
    "fiel": "fallen", "fielen": "fallen", "gefallen": "fallen",
    "fuhr": "fahren", "fuhren": "fahren", "gefahren": "fahren",
    "blieb": "bleiben", "blieben": "bleiben", "geblieben": "bleiben",
    "hieß": "heißen", "hießen": "heißen", "geheißen": "heißen",
    "schrieb": "schreiben", "schrieben": "schreiben",
    "geschrieben": "schreiben",
    "las": "lesen", "lasen": "lesen", "gelesen": "lesen",
    "aß": "essen", "aßen": "essen", "gegessen": "essen",
    "trank": "trinken", "tranken": "trinken", "getrunken": "trinken",
    "starb": "sterben", "starben": "sterben", "gestorben": "sterben",
    "kannte": "kennen", "kannten": "kennen", "gekannt": "kennen",
    "nannte": "nennen", "nannten": "nennen", "genannt": "nennen",
    "rief": "rufen", "riefen": "rufen", "gerufen": "rufen",
    "trug": "tragen", "trugen": "tragen", "getragen": "tragen",
    "zog": "ziehen", "zogen": "ziehen", "gezogen": "ziehen",
    "flog": "fliegen", "flogen": "fliegen", "geflogen": "fliegen",
    "verlor": "verlieren", "verloren": "verlieren",
    # second tier of strong verbs (r6): preterite / participle → infinitive
    "schlief": "schlafen", "schliefen": "schlafen",
    "geschlafen": "schlafen",
    "traf": "treffen", "trafen": "treffen", "getroffen": "treffen",
    "half": "helfen", "halfen": "helfen", "geholfen": "helfen",
    "begann": "beginnen", "begannen": "beginnen",
    "begonnen": "beginnen",
    # identity guards: infinitives the -innen plural rule would mangle
    "beginnen": "beginnen", "gewinnen": "gewinnen",
    "entrinnen": "entrinnen", "zerrinnen": "zerrinnen",
    "sang": "singen", "sangen": "singen", "gesungen": "singen",
    "sprang": "springen", "sprangen": "springen",
    "gesprungen": "springen",
    "schwamm": "schwimmen", "schwammen": "schwimmen",
    "geschwommen": "schwimmen",
    "saß": "sitzen", "saßen": "sitzen", "gesessen": "sitzen",
    "lag": "liegen", "lagen": "liegen", "gelegen": "liegen",
    "hing": "hängen", "hingen": "hängen", "gehangen": "hängen",
    "schlug": "schlagen", "schlugen": "schlagen",
    "geschlagen": "schlagen",
    "wuchs": "wachsen", "wuchsen": "wachsen", "gewachsen": "wachsen",
    "wusch": "waschen", "wuschen": "waschen", "gewaschen": "waschen",
    "schloss": "schließen", "schlossen": "schließen",
    "geschlossen": "schließen",
    "vergaß": "vergessen", "vergaßen": "vergessen",
    "vergessen": "vergessen",
    "bot": "bieten", "boten": "bieten", "geboten": "bieten",
    "band": "binden", "banden": "binden", "gebunden": "binden",
    "schien": "scheinen", "schienen": "scheinen",
    "geschienen": "scheinen",
    "stieg": "steigen", "stiegen": "steigen", "gestiegen": "steigen",
    "griff": "greifen", "griffen": "greifen", "gegriffen": "greifen",
    "litt": "leiden", "litten": "leiden", "gelitten": "leiden",
    "schnitt": "schneiden", "schnitten": "schneiden",
    "geschnitten": "schneiden",
    "ritt": "reiten", "geritten": "reiten",
    "bat": "bitten", "baten": "bitten", "gebeten": "bitten",
    "warf": "werfen", "warfen": "werfen", "geworfen": "werfen",
    "fing": "fangen", "fingen": "fangen", "gefangen": "fangen",
    "tat": "tun", "taten": "tun", "getan": "tun", "tut": "tun",
    # irregular present forms (3sg umlaut / stem change — unambiguous)
    "gibt": "geben", "sieht": "sehen", "nimmt": "nehmen",
    "spricht": "sprechen", "läuft": "laufen", "fällt": "fallen",
    "fährt": "fahren", "hält": "halten", "lässt": "lassen",
    "liest": "lesen", "isst": "essen", "trifft": "treffen",
    "hilft": "helfen", "stirbt": "sterben", "wirft": "werfen",
    "fängt": "fangen", "schläft": "schlafen", "trägt": "tragen",
    "wäscht": "waschen", "wächst": "wachsen", "vergisst": "vergessen",
    # modals
    "kann": "können", "kannst": "können", "konnte": "können",
    "konnten": "können", "gekonnt": "können", "könnte": "können",
    "muss": "müssen", "musst": "müssen", "musste": "müssen",
    "mussten": "müssen", "müsste": "müssen",
    "will": "wollen", "willst": "wollen", "wollte": "wollen",
    "wollten": "wollen", "gewollt": "wollen",
    "soll": "sollen", "sollst": "sollen", "sollte": "sollen",
    "sollten": "sollen",
    "darf": "dürfen", "darfst": "dürfen", "durfte": "dürfen",
    "durften": "dürfen", "dürfte": "dürfen",
    "mag": "mögen", "magst": "mögen", "mochte": "mögen",
    "mochten": "mögen", "möchte": "mögen", "möchten": "mögen",
}

# derivational plurals that are safe to singularize (suffix is unambiguous)
_DE_SAFE_PLURALS = (
    ("ungen", "ung"),     # zeitungen → zeitung
    ("heiten", "heit"),   # schönheiten → schönheit
    ("keiten", "keit"),   # möglichkeiten → möglichkeit
    ("schaften", "schaft"),  # freundschaften → freundschaft
    ("ismen", "ismus"),   # organismen → organismus
    ("innen", "in"),      # lehrerinnen → lehrerin
)


def german_lemma(word: str) -> str:
    """Deterministic German lemma of a lowercase alpha word — irregular
    table plus only unambiguous derivational-plural rules."""
    if word in IRREGULAR_DE:
        return IRREGULAR_DE[word]
    for suf, rep in _DE_SAFE_PLURALS:
        if word.endswith(suf) and len(word) > len(suf) + 2:
            return word[: -len(suf)] + rep
    return word


# Spanish (third language behind the ByLanguage seam): irregular table for
# the highest-frequency verbs + only unambiguous derivational-plural rules —
# same conservative design as german_lemma.
IRREGULAR_ES = {
    # ser
    "soy": "ser", "eres": "ser", "es": "ser", "somos": "ser", "son": "ser",
    "era": "ser", "eran": "ser", "fue": "ser", "fueron": "ser",
    "sido": "ser",
    # estar
    "estoy": "estar", "está": "estar", "estás": "estar", "estamos": "estar",
    "están": "estar", "estaba": "estar", "estaban": "estar",
    "estado": "estar",
    # ir
    "voy": "ir", "vas": "ir", "va": "ir", "vamos": "ir", "van": "ir",
    "iba": "ir", "iban": "ir", "ido": "ir",
    # haber
    "he": "haber", "has": "haber", "ha": "haber", "hay": "haber",
    "hemos": "haber", "han": "haber", "había": "haber", "habían": "haber",
    "hubo": "haber", "habido": "haber",
    # tener
    "tengo": "tener", "tienes": "tener", "tiene": "tener",
    "tenemos": "tener", "tienen": "tener", "tenía": "tener",
    "tenían": "tener", "tuvo": "tener", "tuvieron": "tener",
    "tenido": "tener",
    # hacer
    "hago": "hacer", "hace": "hacer", "hacen": "hacer", "hacía": "hacer",
    "hizo": "hacer", "hicieron": "hacer", "hecho": "hacer",
    # decir
    "digo": "decir", "dice": "decir", "dicen": "decir", "dijo": "decir",
    "dijeron": "decir", "dicho": "decir",
    # poder
    "puedo": "poder", "puede": "poder", "pueden": "poder",
    "podía": "poder", "pudo": "poder", "pudieron": "poder",
    "podido": "poder",
    # querer / saber / ver / dar
    "quiero": "querer", "quiere": "querer", "quieren": "querer",
    "quería": "querer", "quiso": "querer",
    "sé": "saber", "sabe": "saber", "saben": "saber", "sabía": "saber",
    "supo": "saber",
    "veo": "ver", "ve": "ver", "ven": "ver", "veía": "ver", "vio": "ver",
    "visto": "ver",
    "doy": "dar", "da": "dar", "dan": "dar", "daba": "dar", "dio": "dar",
    "dado": "dar",
    # second tier of high-frequency verbs (r6)
    # venir
    "vengo": "venir", "viene": "venir", "vienen": "venir",
    "venía": "venir", "vino": "venir", "vinieron": "venir",
    "venido": "venir", "viniendo": "venir",
    # poner
    "pongo": "poner", "pone": "poner", "ponen": "poner",
    "ponía": "poner", "puso": "poner", "pusieron": "poner",
    "puesto": "poner",
    # salir
    "salgo": "salir", "sale": "salir", "salen": "salir",
    "salía": "salir", "salió": "salir", "salido": "salir",
    # seguir
    "sigo": "seguir", "sigue": "seguir", "siguen": "seguir",
    "siguió": "seguir", "siguieron": "seguir", "seguido": "seguir",
    "siguiendo": "seguir",
    # volver
    "vuelvo": "volver", "vuelve": "volver", "vuelven": "volver",
    "volvió": "volver", "vuelto": "volver",
    # sentir
    "siento": "sentir", "siente": "sentir", "sienten": "sentir",
    "sintió": "sentir", "sintieron": "sentir", "sentido": "sentir",
    "sintiendo": "sentir",
    # traer
    "traigo": "traer", "trae": "traer", "traen": "traer",
    "trajo": "traer", "trajeron": "traer", "traído": "traer",
    # oír
    "oigo": "oír", "oye": "oír", "oyen": "oír", "oyó": "oír",
    "oyeron": "oír", "oído": "oír", "oyendo": "oír",
    # dormir / morir
    "duermo": "dormir", "duerme": "dormir", "duermen": "dormir",
    "durmió": "dormir", "dormido": "dormir", "durmiendo": "dormir",
    "muere": "morir", "mueren": "morir", "murió": "morir",
    "murieron": "morir", "muerto": "morir",
    # pedir
    "pido": "pedir", "pide": "pedir", "piden": "pedir",
    "pidió": "pedir", "pidieron": "pedir", "pedido": "pedir",
    "pidiendo": "pedir",
    # conocer / parecer
    "conozco": "conocer", "conoce": "conocer", "conocen": "conocer",
    "conoció": "conocer", "conocido": "conocer",
    "parezco": "parecer", "parece": "parecer", "parecen": "parecer",
    "pareció": "parecer", "parecido": "parecer",
    # creer / leer / caer (y-stem preterites and gerunds)
    "creo": "creer", "cree": "creer", "creen": "creer",
    "creyó": "creer", "creyeron": "creer", "creído": "creer",
    "creyendo": "creer",
    "leo": "leer", "lee": "leer", "leen": "leer", "leyó": "leer",
    "leyeron": "leer", "leído": "leer", "leyendo": "leer",
    "caigo": "caer", "cae": "caer", "caen": "caer", "cayó": "caer",
    "cayeron": "caer", "caído": "caer", "cayendo": "caer",
    # jugar / pensar / encontrar (stem-changing presents)
    "juego": "jugar", "juega": "jugar", "juegan": "jugar",
    "jugó": "jugar",
    "pienso": "pensar", "piensa": "pensar", "piensan": "pensar",
    "encuentro": "encontrar", "encuentra": "encontrar",
    "encuentran": "encontrar",
    # estar/tener/hacer/decir/poder: preterite + conditional tails
    "estuvo": "estar", "estuvieron": "estar", "estuve": "estar",
    "tuve": "tener", "tendrá": "tener", "tendría": "tener",
    "hice": "hacer", "hará": "hacer", "haría": "hacer",
    "haciendo": "hacer", "hacemos": "hacer", "hicimos": "hacer",
    "dije": "decir", "dirá": "decir", "diría": "decir",
    "diciendo": "decir",
    "pude": "poder", "podrá": "poder", "podría": "poder",
    "pudiendo": "poder",
    # ser/ir shared + gerund
    "fui": "ser", "fuimos": "ser", "yendo": "ir",
    "habrá": "haber", "habría": "haber", "hubiera": "haber",
}

_ES_SAFE_PLURALS = (
    ("ciones", "ción"),   # canciones → canción
    ("siones", "sión"),   # decisiones → decisión
    ("dades", "dad"),     # ciudades → ciudad, posibilidades → posibilidad
    ("tudes", "tud"),     # actitudes → actitud
)


def spanish_lemma(word: str) -> str:
    """Deterministic Spanish lemma of a lowercase alpha word — irregular
    table plus only unambiguous derivational-plural rules."""
    if word in IRREGULAR_ES:
        return IRREGULAR_ES[word]
    for suf, rep in _ES_SAFE_PLURALS:
        if word.endswith(suf) and len(word) > len(suf) + 2:
            return word[: -len(suf)] + rep
    return word


IRREGULAR_FR = {
    # être
    "suis": "être", "es": "être", "est": "être", "sommes": "être",
    "êtes": "être", "sont": "être", "étais": "être", "était": "être",
    "étions": "être", "étiez": "être", "étaient": "être",
    "fut": "être", "furent": "être", "été": "être", "étant": "être",
    "sera": "être", "serait": "être", "seront": "être", "soit": "être",
    "soient": "être",
    # avoir
    "ai": "avoir", "as": "avoir", "a": "avoir", "avons": "avoir",
    "avez": "avoir", "ont": "avoir", "avais": "avoir", "avait": "avoir",
    "avaient": "avoir", "eut": "avoir", "eurent": "avoir", "eu": "avoir",
    "eue": "avoir", "eues": "avoir", "aura": "avoir", "aurait": "avoir",
    "auront": "avoir", "ayant": "avoir", "ait": "avoir",
    # aller
    "vais": "aller", "vas": "aller", "va": "aller", "allons": "aller",
    "allez": "aller", "vont": "aller", "allais": "aller",
    "allait": "aller", "allaient": "aller", "alla": "aller",
    "allé": "aller", "allée": "aller", "allés": "aller",
    "allées": "aller", "ira": "aller", "irait": "aller",
    "iront": "aller", "aille": "aller",
    # faire
    "fais": "faire", "fait": "faire", "faisons": "faire",
    "faites": "faire", "font": "faire", "faisait": "faire",
    "faisaient": "faire", "fit": "faire", "firent": "faire",
    "fera": "faire", "ferait": "faire", "feront": "faire",
    "faisant": "faire", "fasse": "faire", "faits": "faire",
    # dire
    "dis": "dire", "dit": "dire", "disons": "dire", "dites": "dire",
    "disent": "dire", "disait": "dire", "dirent": "dire",
    "dira": "dire", "disant": "dire",
    # pouvoir
    "peux": "pouvoir", "peut": "pouvoir", "pouvons": "pouvoir",
    "pouvez": "pouvoir", "peuvent": "pouvoir", "pouvait": "pouvoir",
    "pouvaient": "pouvoir", "put": "pouvoir", "purent": "pouvoir",
    "pu": "pouvoir", "pourra": "pouvoir", "pourrait": "pouvoir",
    "pourront": "pouvoir", "puisse": "pouvoir",
    # vouloir
    "veux": "vouloir", "veut": "vouloir", "voulons": "vouloir",
    "voulez": "vouloir", "veulent": "vouloir", "voulait": "vouloir",
    "voulut": "vouloir", "voulu": "vouloir", "voudra": "vouloir",
    "voudrait": "vouloir", "veuille": "vouloir",
    # savoir
    "sais": "savoir", "sait": "savoir", "savons": "savoir",
    "savez": "savoir", "savent": "savoir", "savait": "savoir",
    "sut": "savoir", "su": "savoir", "saura": "savoir",
    "saurait": "savoir", "sache": "savoir", "sachant": "savoir",
    # venir
    "viens": "venir", "vient": "venir", "venons": "venir",
    "venez": "venir", "viennent": "venir", "venait": "venir",
    "vint": "venir", "vinrent": "venir", "venu": "venir",
    "venue": "venir", "venus": "venir", "venues": "venir",
    "viendra": "venir", "viendrait": "venir",
    # voir ("vit" omitted: ambiguous with vivre 3sg present)
    "vois": "voir", "voit": "voir", "voyons": "voir", "voyez": "voir",
    "voient": "voir", "voyait": "voir", "virent": "voir", "vu": "voir",
    "vue": "voir", "vus": "voir", "vues": "voir", "verra": "voir",
    "verrait": "voir", "voyant": "voir",
    # prendre
    "prends": "prendre", "prend": "prendre", "prenons": "prendre",
    "prenez": "prendre", "prennent": "prendre", "prenait": "prendre",
    "prit": "prendre", "prirent": "prendre", "pris": "prendre",
    "prise": "prendre", "prendra": "prendre", "prenant": "prendre",
    # mettre
    "mets": "mettre", "met": "mettre", "mettons": "mettre",
    "mettez": "mettre", "mettent": "mettre", "mettait": "mettre",
    "mit": "mettre", "mirent": "mettre", "mis": "mettre",
    "mise": "mettre", "mettra": "mettre", "mettant": "mettre",
    # devoir
    "dois": "devoir", "doit": "devoir", "devons": "devoir",
    "devez": "devoir", "doivent": "devoir", "devait": "devoir",
    "dut": "devoir", "dû": "devoir", "due": "devoir",
    "devra": "devoir", "devrait": "devoir",
    # croire
    "crois": "croire", "croit": "croire", "croyons": "croire",
    "croyez": "croire", "croient": "croire", "croyait": "croire",
    "crut": "croire", "cru": "croire", "croira": "croire",
    "croyant": "croire",
    # falloir (impersonal)
    "faut": "falloir", "fallait": "falloir", "fallu": "falloir",
    "faudra": "falloir", "faudrait": "falloir", "faille": "falloir",
    # -aux plurals the suffix rule would mangle (travaux → "traval")
    "travaux": "travail", "vitraux": "vitrail", "émaux": "émail",
    "yeux": "œil", "cieux": "ciel",
}

_FR_SAFE_PLURALS = (
    ("tions", "tion"),    # nations → nation
    ("sions", "sion"),    # décisions → décision
    ("ités", "ité"),      # activités → activité
    ("ments", "ment"),    # gouvernements → gouvernement
    ("eaux", "eau"),      # châteaux → château (before the -aux rule)
    ("aux", "al"),        # journaux → journal, animaux → animal
)


def french_lemma(word: str) -> str:
    """Deterministic French lemma of a lowercase alpha word — irregular
    table plus only unambiguous derivational-plural rules (the -aux
    exceptions live in the irregular table)."""
    if word in IRREGULAR_FR:
        return IRREGULAR_FR[word]
    for suf, rep in _FR_SAFE_PLURALS:
        # 5-char derivational suffixes are safe with a 2-char stem
        # (nations, visions, moments); the short -aux/-eaux rules need a
        # 3-char stem so invariants like chaux/taux stay untouched
        min_stem = 2 if len(suf) >= 5 else 3
        if word.endswith(suf) and len(word) >= len(suf) + min_stem:
            return word[: -len(suf)] + rep
    return word


_REGISTRY: dict[str, Lemmatizer | None] = {
    "identity": None,
    "english": english_lemma,
    "german": german_lemma,
    "spanish": spanish_lemma,
    "french": french_lemma,
}


def get_lemmatizer(name):
    """Resolve a lemmatizer spec (None/'identity' → no-op). Callables pass
    through, so cluster images with spaCy can inject one. A dict
    ``{lang: spec}`` resolves to a ``ByLanguage`` router — the reference
    picks its spaCy model per document language
    (extract_words.py:60,348,370), and this is the seam's analog."""
    if name is None or isinstance(name, ByLanguage) or callable(name):
        return name
    if isinstance(name, dict):
        return ByLanguage(name)
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown lemmatizer {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


class ByLanguage:
    """Per-language lemmatizer routing (T1 seam, multilingual form): the
    engine analog of the reference's ``SPACY_MODEL_NAME[lang]`` model
    selection (extract_words.py:60,348,370). ``mapping`` values are registry
    names or callables; ``default`` applies to unlisted languages (None =
    identity). The batch tokenizer splits each Arrow batch by document
    language so per-unique-token lemma memoization stays correct per
    language (textparse_vec.tokenize_batch)."""

    def __init__(self, mapping: dict, default=None):
        self.mapping = {
            k: get_lemmatizer(v) for k, v in sorted(mapping.items())
        }
        self.default = get_lemmatizer(default)

        def _n(f):
            return getattr(f, "__name__", "identity") if f else "identity"

        inner = ",".join(f"{k}={_n(v)}" for k, v in self.mapping.items())
        # stable name: build_index records it in stats.json as part of the
        # tokenizer version (cache/lineage key) — must not contain object ids
        self.__name__ = f"bylang({inner};default={_n(self.default)})"

    def for_lang(self, lang: str | None) -> Lemmatizer | None:
        return self.mapping.get(lang or "en", self.default)

    def __repr__(self) -> str:
        return self.__name__
