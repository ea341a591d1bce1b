"""Action label enumerations for the supported datasets.

Mirrors the reference enumerators (reference: data_loaders/a2m/feeder.py:
271-410): NTU120 two-person (26 mutual classes), NTU120 one-person (94),
Chi3D (8), GTA (1).
"""

NTU_2P_ACTIONS = {
    0: "punching or slapping other person",
    1: "kicking other person",
    2: "pushing other person",
    3: "pat on back of other person",
    4: "point finger at the other person",
    5: "hugging other person",
    6: "giving something to other person",
    7: "touch other person's pocket",
    8: "handshaking",
    9: "walking towards each other",
    10: "walking apart from each other",
    11: "hit other person with something",
    12: "wield knife towards other person",
    13: "knock over other person (hit with body)",
    14: "grab other person's stuff",
    15: "shoot at other person with a gun",
    16: "step on foot",
    17: "high-five",
    18: "cheers and drink",
    19: "carry something with other person",
    20: "take a photo of other person",
    21: "follow other person",
    22: "whisper in other person's ear",
    23: "exchange things with other person",
    24: "support somebody with hand",
    25: "finger-guessing game (playing rock-paper-scissors)",
}

NTU_1P_ACTIONS = {
    0: "drink water", 1: "eat meal or snack", 2: "brushing teeth",
    3: "brushing hair", 4: "drop", 5: "pickup", 6: "throw",
    7: "sitting down", 8: "standing up (from sitting position)",
    9: "clapping", 10: "reading", 11: "writing", 12: "tear up paper",
    13: "wear jacket", 14: "take off jacket", 15: "wear a shoe",
    16: "take off a shoe", 17: "wear on glasses", 18: "take off glasses",
    19: "put on a hat or cap", 20: "take off a hat or cap", 21: "cheer up",
    22: "hand waving", 23: "kicking something", 24: "reach into pocket",
    25: "hopping (one foot jumping)", 26: "jump up",
    27: "make a phone call or answer phone", 28: "playing with phone or tablet",
    29: "typing on a keyboard", 30: "pointing to something with finger",
    31: "taking a selfie", 32: "check time (from watch)",
    33: "rub two hands together", 34: "nod head or bow", 35: "shake head",
    36: "wipe face", 37: "salute", 38: "put the palms together",
    39: "cross hands in front (say stop)", 40: "sneeze or cough",
    41: "staggering", 42: "falling", 43: "touch head (headache)",
    44: "touch chest (stomachache or heart pain)", 45: "touch back (backache)",
    46: "touch neck (neckache)", 47: "nausea or vomiting condition",
    48: "use a fan (with hand or paper) or feeling warm",
    49: "put on headphone", 50: "take off headphone", 51: "shoot at the basket",
    52: "bounce ball", 53: "tennis bat swing",
    54: "juggling table tennis balls", 55: "hush (quite)", 56: "flick hair",
    57: "thumb up", 58: "thumb down", 59: "make ok sign",
    60: "make victory sign", 61: "staple book", 62: "counting money",
    63: "cutting nails", 64: "cutting paper (using scissors)",
    65: "snapping fingers", 66: "open bottle", 67: "sniff (smell)",
    68: "squat down", 69: "toss a coin", 70: "fold paper",
    71: "ball up paper", 72: "play magic cube", 73: "apply cream on face",
    74: "apply cream on hand back", 75: "put on bag", 76: "take off bag",
    77: "put something into a bag", 78: "take something out of a bag",
    79: "open a box", 80: "move heavy objects", 81: "shake fist",
    82: "throw up cap or hat", 83: "hands up (both hands)", 84: "cross arms",
    85: "arm circles", 86: "arm swings", 87: "running on the spot",
    88: "butt kicks (kick backward)", 89: "cross toe touch", 90: "side kick",
    91: "yawn", 92: "stretch oneself", 93: "blow nose",
}

CHI3D_ACTIONS = {
    0: "Grab", 1: "Handshake", 2: "Hit", 3: "HoldingHands", 4: "Hug",
    5: "Kick", 6: "Posing", 7: "Push",
}

GTA_ACTIONS = {0: "Combat"}
