#!/usr/bin/env python3
"""Generate fixtures/natural_docs.parquet — the committed NATURAL-LANGUAGE
dedup fixture (SURVEY §2.9: every selectivity measurement rode the
synthetic zipf corpus; this validates the J≈0.8 thresholds and the
boilerplate/containment behavior on real English word statistics).

The text is original prose written for this fixture (no external source,
so no license or egress concern) with the duplicate structure a crawl
actually shows, all DERIVED DETERMINISTICALLY from the base paragraphs:

  - doc_id 1..20   base articles (distinct topics, natural stopword mix)
  - doc_id 21..24  exact mirrors of bases 1-4 (same bytes, new source)
  - doc_id 25..28  boilerplate variants of bases 5-8 (site chrome added:
                   header + footer around an unchanged body) — high
                   containment of the base, Jaccard near but below 1
  - doc_id 29..30  mutated copies of bases 9-10 (fixed word
                   substitutions: 2 subs ≈ J 0.85 above the 0.8 bar,
                   8 subs ≈ J 0.5 below it)
  - doc_id 31      a commentary doc QUOTING base 11 in full — the
                   asymmetric-containment case Jaccard misses
  - doc_id 32..40  unrelated shorts sharing only stopwords (the
                   false-positive bar)

Run once; the parquet is committed. Re-running reproduces identical rows
(only parquet metadata may differ).
"""
import pandas as pd

BASES = [
    # 1
    "the harbor was quiet before dawn and the fishing boats rocked gently "
    "against their moorings while the first gulls circled overhead looking "
    "for scraps left on the pier from the night before . by the time the sun "
    "cleared the headland most of the crews had already cast off and the "
    "water behind them folded into long silver lines that faded slowly back "
    "into the grey swell .",
    # 2
    "to make a simple loaf of bread you need little more than flour water "
    "salt and patience . mix the dough until it comes together in a shaggy "
    "mass then let it rest so the flour can absorb the water fully . fold it "
    "a few times over the next hour shape it into a round and bake it in a "
    "hot covered pot until the crust turns a deep brown and the kitchen "
    "smells like a bakery .",
    # 3
    "the committee met on tuesday to review the budget proposal for the "
    "coming year . after a long discussion about maintenance costs and the "
    "schedule for roof repairs the members agreed to defer the purchase of "
    "new equipment until spring . the treasurer noted that reserves remain "
    "healthy but warned that insurance premiums are expected to rise again "
    "next year .",
    # 4
    "a glacier moves more slowly than almost anything else we call motion "
    "yet it carves valleys that outlast every map drawn of them . snow "
    "falls compresses into ice and the whole mass creeps downhill under its "
    "own weight grinding rock into flour that turns meltwater rivers a pale "
    "milky green . when the climate warms the ice retreats and leaves "
    "behind ridges of rubble to mark where it paused .",
    # 5
    "the library on forest street keeps its local history room open on "
    "thursday afternoons . volunteers have spent a decade scanning old "
    "photographs of the mill the train depot and the flood of nineteen "
    "thirty six . anyone researching a family name can ask at the desk for "
    "the card index which still outperforms the computer catalogue for "
    "anything older than the nineteen fifties .",
    # 6
    "honey bees navigate by the angle of the sun and communicate distance "
    "and direction through a dance performed in darkness on the vertical "
    "face of the comb . a forager returning from a rich patch of clover "
    "will waggle in a figure of eight and the length of the middle run "
    "tells her sisters how far to fly . it is one of the few known symbolic "
    "languages outside our own .",
    # 7
    "the night train to the coast leaves from platform nine a little after "
    "eleven . regulars bring blankets because the heating is unreliable "
    "past the junction and the windows rattle in their frames when the "
    "freight lines merge . still there is no better way to arrive than to "
    "wake at first light with the smell of salt already in the corridor and "
    "the tide flat and bright outside .",
    # 8
    "good compost wants a balance of green material and brown material "
    "turned often enough to keep air in the pile . grass clippings and "
    "vegetable peelings supply nitrogen while dry leaves and torn cardboard "
    "supply carbon . if the heap smells sour it is too wet so fork in more "
    "brown matter . in a few months the centre turns dark and crumbly and "
    "smells like the floor of a forest .",
    # 9
    "the violin section rehearsed the slow movement twice before the "
    "conductor was satisfied with the phrasing . she asked the players to "
    "think of the melody as a question asked three times each time more "
    "quietly and to let the final chord fade rather than stop . the hall "
    "was cold and half lit but by the second run the sound had found its "
    "warmth .",
    # 10
    "a desert after rain is a brief and extravagant argument against its "
    "own reputation . seeds that waited years underground sprint through "
    "whole lifetimes in a fortnight carpeting the gravel with flowers . "
    "toads climb out of cracked clay ponds that exist for a week . then the "
    "water is gone the colour folds back into the soil and the long "
    "patience begins again .",
    # 11
    "the bridge was built in eighteen ninety two from local granite and "
    "iron shipped upriver by barge . engineers of the day doubted a single "
    "arch could span the gorge but the design has needed little more than "
    "new railings in a century of service . it remains the only crossing "
    "for forty miles and the parish still pays a shilling a year in "
    "ceremonial rent for the southern footing .",
    # 12
    "learning to read tide tables takes an afternoon and repays it for "
    "life . the times of high and low water shift by roughly fifty minutes "
    "a day and the range swells and shrinks with the phase of the moon . "
    "spring tides expose sandbars that neap tides never uncover which is "
    "why the same beach can be a different country from one week to the "
    "next .",
    # 13
    "the bakery on the corner changed hands last autumn and the new owners "
    "kept the sourdough starter that has been fed daily since the shop "
    "opened . customers claim they can taste the difference between rye "
    "baked on monday and rye baked on friday though the bakers privately "
    "doubt it . the queue on saturday mornings still turns the corner by "
    "eight .",
    # 14
    "migrating cranes fly in long wavering lines that re form constantly "
    "as birds trade places at the front where the air is hardest . they "
    "call continuously a low rolling bugle that carries for miles and "
    "marks the change of season more reliably than any calendar . farmers "
    "time the last cut of hay by their passing and swear by it .",
    # 15
    "the museum's clockwork gallery holds a tide predicting machine of "
    "brass gears and wire cables that once guided harbours across an "
    "empire . an attendant winds it on the first of the month and for a "
    "few minutes the pointers sweep through a year of tides in miniature . "
    "children watch the little pulleys rise and fall and ask if it is a "
    "kind of computer . it is .",
    # 16
    "frost on a single pane of glass grows by rules no gardener would "
    "recognise yet the result looks like ferns . water vapour freezes "
    "first along scratches and dust then each new crystal becomes the seed "
    "for the next branching outward until the whole window is a white "
    "forest that the morning sun erases in an hour .",
    # 17
    "the chess club meets above the hardware store on wednesday evenings . "
    "the strongest player is a quiet plumber who learned from his "
    "grandmother and has never read an opening book . juniors are given "
    "tea biscuits and a standing piece of advice look at the whole board "
    "before you touch anything which serves them well beyond the game .",
    # 18
    "old orchards keep varieties of apple that no supermarket will ever "
    "stock russets with skin like sandpaper and sharp little pippins that "
    "sweeten only after the first frost . cider makers prize them because "
    "flavour that is too loud for eating fresh is exactly what survives "
    "fermentation . every tree lost takes a name and a taste with it .",
    # 19
    "the lighthouse keeper's log records weather shipping and small "
    "disasters in the same flat hand for fifty years . january third gale "
    "from the northeast lamp trimmed at midnight one lens cracked . the "
    "entries never exceed two lines yet read together they amount to a "
    "life and a fair history of the coast besides .",
    # 20
    "a good map of a small place is an act of attention . the surveyor "
    "walks the parish twice once with instruments and once without "
    "letting the field paths correct the geometry . the finished sheet "
    "shows the spring that floods the lane every february and the oak "
    "that marks the old boundary because leaving them off would make the "
    "map less true not more tidy .",
]

HEADER = ("welcome to our site home news archive contact subscribe to the "
          "weekly newsletter for updates .")
FOOTER = ("all rights reserved . terms of use privacy policy copyright two "
          "thousand twenty four .")

# fixed word substitutions, applied first-occurrence-only: (old, new)
MUT_LIGHT = [("conductor", "director"), ("melody", "theme")]
MUT_HEAVY = [("desert", "steppe"), ("rain", "storms"), ("seeds", "bulbs"),
             ("gravel", "shingle"), ("flowers", "blossom"), ("toads", "frogs"),
             ("week", "month"), ("colour", "green")]

UNRELATED = [
    "turn left at the second junction and follow the gravel road until the "
    "barn with the green roof comes into view . parking is in the field on "
    "the right and the entrance fee goes to the village hall restoration "
    "fund .",
    "the recipe serves four people and takes about forty minutes from "
    "start to finish . leftovers keep well in the fridge for two days and "
    "the sauce freezes better than you would expect .",
    "please remember that the pool is closed for maintenance on the first "
    "monday of every month and that children under eight must be "
    "accompanied by an adult at all times .",
    "the forecast promises a dry morning with showers arriving from the "
    "west after lunch so the match will start an hour earlier than "
    "printed in the fixture list .",
    "our repair shop handles bicycles of every age but parts for the "
    "oldest three speed hubs can take a fortnight to arrive so plan "
    "ahead if you ride daily .",
    "the evening class covers basic knife skills stock making and three "
    "sauces over six weeks and students take home what they cook each "
    "night .",
    "volunteers are needed to help plant the community orchard on "
    "saturday bring a spade if you have one and stout boots whatever the "
    "weather .",
    "the branch line timetable changes twice a year and the sunday "
    "service is reduced in winter so check the board at the station "
    "before travelling .",
    "membership renewals are due at the end of march and the discount "
    "for paying the full year in advance continues as before .",
]


def substitute(text, pairs):
    for old, new in pairs:
        text = text.replace(old, new, 1)
    return text


def clean(text):
    """Drop standalone-period tokens and apostrophes: the engine's
    shingle tokenizer (TextOps.normalize) maps punctuation to spaces
    while the shared oracle CTE splits raw lowered text on whitespace —
    on punctuation-free text the two pipelines are identical, so every
    standard oracle chain applies verbatim. Lexical realism (word, df,
    stopword distribution) is what this fixture exists for; punctuation
    tokens are not.
    """
    return " ".join(w for w in text.replace("'", "").split() if w != ".")


def main():
    rows = []

    def add(source, text):
        rows.append({"doc_id": len(rows) + 1, "source": source,
                     "text": clean(text)})

    for t in BASES:
        add("siteA", t)
    for i in range(4):                     # 21-24 exact mirrors of 1-4
        add("mirror", BASES[i])
    for i in range(4, 8):                  # 25-28 boilerplate variants of 5-8
        add("aggregator", f"{HEADER} {BASES[i]} {FOOTER}")
    add("blog", substitute(BASES[8], MUT_LIGHT))   # 29: ~J 0.85 vs base 9
    add("blog", substitute(BASES[9], MUT_HEAVY))   # 30: ~J 0.5 vs base 10
    add("siteB",                                     # 31: quotes base 11 whole
        "few structures say as much about a town as its river crossing "
        "and the parish archive puts it best . " + BASES[10] +
        " the full survey appears in the spring issue of the county "
        "history journal .")
    for t in UNRELATED:                    # 32-40
        add("siteB", t)

    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df.to_parquet("fixtures/natural_docs.parquet", index=False)
    print(df.groupby("source").size())
    print(f"{len(df)} docs written")


if __name__ == "__main__":
    main()
