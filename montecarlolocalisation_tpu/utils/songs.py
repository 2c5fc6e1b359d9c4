"""Audible feedback: the reference's song library as data + event mapping.

Reference: src/songs_lib.cpp + include/package/songs_lib.hpp.  Songs are
(MIDI note, duration) pairs uploaded to the iRobot Create; here they are
plain data the event stream references — song 1 = lost, 2 = recovered,
3 = lost (long), 4 = gold-waypoint jingle ("rickroll"), 5 = pickup jingle
("baby shark").  The filter/mission layers emit song NUMBERS (MCLOutput.song,
MissionLeg.song); a real robot backend would upload + play these.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

# MIDI note numbers (songs_lib.hpp note constants).
A3, D4, E4, F4, G4, A4, B4, D5, E5, G5 = 57, 62, 64, 65, 67, 69, 71, 74, 76, 79
# Durations in driver ticks (songs_lib.hpp): sixteenth, eighth-dotted, quarter.
S, Ed, Q = 8, 24, 32

Song = List[Tuple[int, int]]

SONGS: Dict[int, Song] = {
    # "Lost" (songs_lib.cpp store1)
    1: [(A3, S), (D4, S)],
    # "Recovered / juhu" (store2)
    2: [(D4, S), (G4, Q), (G4, S), (G4, S), (F4, Q)],
    # Long lost (store3)
    3: [(A3, Q), (A3, Q), (A3, Q), (D4, Q)],
    # Gold jingle (store4, rickroll)
    4: [(D4, Q), (E4, Q), (G4, Q), (E4, Q), (B4, Ed), (B4, Q), (A4, Q),
        (D4, Q), (E4, Q), (G4, Q), (E4, Q), (A4, Ed), (A4, Q), (G4, Q)],
    # Pickup jingle (store5, baby shark — first phrase)
    5: [(D4, Q), (E4, Q), (G4, Ed), (G4, Ed), (G4, Ed), (G4, S), (G4, S),
        (G4, S), (D4, Ed), (E4, Ed), (G4, S), (G4, S), (G4, S), (G4, S),
        (G4, S), (G4, S)],
}

SONG_LOST = 1
SONG_RECOVERED = 2
SONG_LOST_LONG = 3
SONG_GOLD = 4
SONG_PICKUP = 5


def song_events(song_codes) -> List[Tuple[int, int]]:
    """Filter an episode's per-tick song outputs into (tick, song) events."""
    return [(int(t), int(s)) for t, s in enumerate(song_codes) if int(s) != 0]
