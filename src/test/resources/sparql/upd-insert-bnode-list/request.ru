PREFIX : <http://x/>
INSERT DATA { [ :p "1" ] . }
