"""Songs library: data sanity + event-code consistency across layers.

Reference: src/songs_lib.cpp (song definitions and numbering) and its
consumers — the MCL state machine plays 1/2 (monte_carlo.cpp:1041,1059)
and the mission layer plays 4 per gold, 5 at pickup
(executeChallenge.cpp:295-340).  The TPU rebuild has no speaker; parity is
that every layer emits the SAME song numbers against one shared library.
"""
import jax
import jax.numpy as jnp
import numpy as np

from montecarlolocalisation_tpu.config import FilterConfig, HysteresisConfig
from montecarlolocalisation_tpu.planning import mission
from montecarlolocalisation_tpu.utils import songs


def test_song_library_structure():
    # Five songs, numbered like songs_lib.cpp's store1..store5.
    assert set(songs.SONGS) == {1, 2, 3, 4, 5}
    for num, song in songs.SONGS.items():
        assert len(song) > 0
        for note, dur in song:
            assert 0 <= note <= 127, f"song {num}: bad MIDI note {note}"
            assert dur > 0, f"song {num}: bad duration {dur}"


def test_song_constants_consistent_across_layers():
    # The hysteresis config (MCLOutput.song producer) and the mission layer
    # must agree with the shared library's numbering.
    h = HysteresisConfig()
    assert h.song_lost == songs.SONG_LOST
    assert h.song_recovered == songs.SONG_RECOVERED
    assert mission.SONG_GOLD == songs.SONG_GOLD
    assert mission.SONG_PICKUP == songs.SONG_PICKUP


def test_song_events_filters_zero_ticks():
    codes = [0, 0, songs.SONG_LOST, 0, songs.SONG_RECOVERED, 0]
    assert songs.song_events(codes) == [(2, songs.SONG_LOST),
                                        (4, songs.SONG_RECOVERED)]
    assert songs.song_events(np.zeros(5, np.int32)) == []
    # Accepts device arrays (an episode's MCLOutput.song stream).
    assert songs.song_events(jnp.asarray([0, 3], jnp.int32)) == [(1, 3)]


def test_filter_emits_lost_song_on_transition(default_map):
    # Drive the hysteresis directly: a confident state whose confidence
    # drops below threshold must emit song 1 + wanderer start, exactly once
    # (the reference plays the song only on the TRANSITION tick,
    # monte_carlo.cpp:1035-1045).
    from montecarlolocalisation_tpu.models import filter as mcl

    cfg = FilterConfig(num_particles=128)
    state = mcl.init_state(jax.random.PRNGKey(0), default_map, cfg)
    state = mcl.MCLState(
        **{**{f.name: getattr(state, f.name)
              for f in state.__dataclass_fields__.values()},
           "confidence": jnp.float32(0.1),
           "confident_threshold": jnp.float32(0.5),
           "was_lost": jnp.bool_(False)})
    was_lost, _, _, song, wanderer = mcl._hysteresis(state, default_map, cfg)
    assert bool(was_lost)
    assert int(song) == songs.SONG_LOST
    assert int(wanderer) == mcl.WANDERER_START
    # Second tick, still lost: no re-trigger.
    state2 = mcl.MCLState(
        **{**{f.name: getattr(state, f.name)
              for f in state.__dataclass_fields__.values()},
           "was_lost": jnp.bool_(True)})
    _, _, _, song2, _ = mcl._hysteresis(state2, default_map, cfg)
    assert int(song2) == 0
